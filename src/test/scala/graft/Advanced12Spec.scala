package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Training-run planning ops: budget conservation and redistribution
  * mechanics on a skewed crafted roster, padding waste against a brute
  * Scala recomputation, and the adaptive gate's positional percentile
  * against a hand sort.
  */
class Advanced12Spec extends SparkSuite {
  import spark.implicits._

  private lazy val skewDir: String = {
    val d = Files.createTempDirectory("graft_adv12_fixture").toString
    // source A: 100 docs x 10 tokens = 1000; B and C: 1 doc x 10 each.
    val mk = (i: Long, src: String) =>
      (i, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "en", src, 30L)
    val docs = ((0L until 100L).map(mk(_, "srcA")) :+ mk(100L, "srcB") :+ mk(101L, "srcC"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q136 conserves the budget and redistributes saturated shares") {
    val rows = ops.Advanced12.tokenBudget.run(spark, skewDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("allocated"), r.getAs[Double]("rate")))
      .toMap
    // budget = 1020/2 = 510; round 1: each source min(n, 170) -> A 170,
    // B 10, C 10 (saturated); leftover 320 goes entirely to A.
    assert(rows("srcA") == ((1000L, 490L, 0.49)))
    assert(rows("srcB") == ((10L, 10L, 1.0)))
    assert(rows("srcC") == ((10L, 10L, 1.0)))
    // exact conservation: nothing over-allocated, leftover fully spent
    assert(rows.values.map(_._2).sum == 510L)
    rows.values.foreach { case (n, a, _) => assert(a <= n) }
  }

  test("q137 padding matches a brute recomputation per ordering") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def pad(ordered: Seq[Long]): Long =
      ordered.grouped(8).map(b => b.max * b.length - b.sum).sum
    val want = docs.groupBy(_._2).map { case (lang, ds) =>
      lang -> (
        pad(ds.sortBy(_._1).map(_._3).toSeq),
        pad(ds.sortBy(d => (d._3, d._1)).map(_._3).toSeq))
    }
    val got = ops.Advanced12.paddingWaste.run(spark, sf0001).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("pad_naive"), r.getAs[Long]("pad_sorted"))).toMap
    assert(got == want)
    // NOT asserting sorted <= naive: a heavy tail straddling the final
    // partial batch can make sorting lose (which is exactly what the
    // report exists to surface). On this corpus it does save somewhere:
    assert(got.values.exists { case (n, s) => s < n }, "sorting saved nothing anywhere")
  }

  test("q137 survives a NEGATIVE saving (heavy tail on the partial batch)") {
    // lengths in doc_id order: [1,1,1,1,1,1,100,100,1] -> naive batches
    // {6x1,100,100}=594 pad + {1}=0; sorted batches {7x1,100}=693 + {100}=0.
    // Sorting LOSES; saving = halfUpDiv(-99000, 594)/1000 = -0.167.
    val d = Files.createTempDirectory("graft_adv12_neg").toString
    val lens = Seq(1, 1, 1, 1, 1, 1, 100, 100, 1)
    lens.zipWithIndex.map { case (k, i) =>
      (i.toLong, Seq.fill(k)("w").mkString(" "), "zz", "s0", k.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = ops.Advanced12.paddingWaste.run(spark, d).collect().head
    assert(r.getAs[Long]("pad_naive") == 594L)
    assert(r.getAs[Long]("pad_sorted") == 693L)
    assert(r.getAs[Double]("saving") == -0.167)
  }

  test("q138 threshold is the value at sorted rank ceil(n/10)") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1)).map(_._3)
      val thr = sorted((ds.length + 9) / 10 - 1)
      src -> (ds.length.toLong, thr, ds.count(_._3 > thr).toLong)
    }
    val got = ops.Advanced12.adaptiveQualityGate.run(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("threshold_chars"),
          r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped")))
      .toMap
    got.foreach { case (src, (n, thr, kept, dropped)) =>
      assert((n, thr, kept) == want(src), src)
      assert(kept + dropped == n, src)
    }
    assert(got.keySet == want.keySet)
  }

  test("q142 scrubs exactly the cross-doc duplicated spans") {
    val d = Files.createTempDirectory("graft_adv12_scrub").toString
    val boiler = "all rights reserved by the original publisher"  // 7 toks
    val docs = Seq(
      // doc 0/1: same 7-token boilerplate tail, unique 6-token heads
      (0L, s"alpha beta gamma delta epsilon zeta $boiler", "en", "s0", 80L),
      (1L, s"uno dos tres cuatro cinco seis $boiler", "en", "s0", 80L),
      // doc 2: fully unique, must pass through byte-identical
      (2L, "completely unique text with no shared windows here", "en", "s0", 50L),
      // doc 3: exact duplicate of doc 2's words reordered? no — exact
      // duplicate of a 5-token doc: too short alone, needs a partner
      (3L, "red orange yellow green blue indigo", "en", "s0", 40L),
      (4L, "red orange yellow green blue indigo", "en", "s0", 40L),
      // doc 5: an internal repeat but nothing shared across docs
      (5L, "echo echo echo echo echo echo echo echo", "en", "s0", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = ops.Advanced12.exactSubstrScrub.run(spark, d).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // docs 0/1: the boilerplate's 7 tokens are covered by cross-doc
    // 5-grams; the unique heads keep every token NOT inside a shared
    // window. Head tokens adjacent to the tail stay (the mixed 5-grams
    // differ between docs), so exactly the 7 boilerplate tokens go.
    assert(got(0L) == ((13L, 7L,
      "alpha beta gamma delta epsilon zeta")), got(0L).toString)
    assert(got(1L) == ((13L, 7L, "uno dos tres cuatro cinco seis")), got(1L).toString)
    // unique doc: untouched
    assert(got(2L) == ((8L, 0L,
      "completely unique text with no shared windows here")))
    // exact duplicates: every token covered, both scrub to empty
    assert(got(3L) == ((6L, 6L, "")) && got(4L) == ((6L, 6L, "")))
    // within-doc repetition is NOT corpus duplication — untouched
    assert(got(5L)._2 == 0L && got(5L)._3.startsWith("echo"))
  }
}
