package graft

import graft.ops.SnapshotDiff
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSuite {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("classifies added / removed / changed / unchanged per id") {
    val old = snap((1L, "alpha", "web"), (2L, "beta", "web"), (3L, "gamma", "book"))
    val nw = snap((2L, "beta", "web"), (3L, "gamma v2", "book"), (4L, "delta", "web"))
    val out = SnapshotDiff.diff(old, nw, "doc_id",
        md5(col("text")), length(col("text")), Seq("source"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == ("removed", -5))
    assert(out(2L) == ("unchanged", 0))
    assert(out(3L) == ("changed", 3)) // "gamma v2" is 3 chars longer
    assert(out(4L) == ("added", 5))
  }

  test("tag column prefers the new side, falls back to old for removed ids") {
    val old = snap((1L, "a", "srcA"), (2L, "b", "srcA"))
    val nw = snap((2L, "b", "srcB"))
    val out = SnapshotDiff.diff(old, nw, "doc_id",
        md5(col("text")), length(col("text")), Seq("source"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "srcA") // removed: only the old side knows it
    assert(out(2L) == "srcB") // present in both: new side wins
  }

  test("the diff join never carries the payload column (digest-only shuffle)") {
    val old = snap((1L, "x" * 1000, "web"))
    val nw = snap((1L, "y" * 1000, "web"))
    val d = SnapshotDiff.diff(old, nw, "doc_id",
      md5(col("text")), length(col("text")), Seq("source"))
    val joins = d.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val joinInputs = joins.flatMap(j => j.children.flatMap(_.output.map(_.name)))
    assert(!joinInputs.exists(_ == "text"),
      s"payload column reached the join input: $joinInputs")
  }
}
