package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end corpus build on a crafted corpus where every gate has a
  * victim: a degenerate repetitive doc (quality), an exact duplicate
  * (dedup keeps the smaller id), and a rerun that must reproduce
  * identical shard membership.
  */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_corpus_fixture").toString
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, good, "en", "src0", 60L),
      (1L, good, "en", "src1", 60L),                                     // exact dup of 0
      (2L, "spark spark spark spark spark spark spark spark", "en", "src0", 47L), // repetitive
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es", "src2", 52L),
      (4L, "one two three four five six seven eight nine ten", "en", "src3", 49L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("quality gate and exact dedup both fire; survivors are the right docs") {
    val out = Files.createTempDirectory("graft_corpus_out").toString
    val shards = CorpusPipeline.run(spark, dir, out)
    val ids = shards.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L), "repetitive doc survived the quality gate")
    assert(!ids.contains(1L), "exact duplicate survived (should keep doc 0)")
    // doc 0 kept over its duplicate; src2/src3 docs subject only to mixture
    assert(ids.contains(0L))
    // every surviving row carries split/pack metadata
    val cols = shards.columns.toSet
    assert(Set("split", "pack_id", "shard").subsetOf(cols), cols.toString)
  }

  test("rerun reproduces identical shard membership (sf0.001)") {
    val out = Files.createTempDirectory("graft_corpus_out2").toString
    def membership(): Map[Long, Long] =
      CorpusPipeline.run(spark, sf0001, out)
        .select(col("doc_id"), col("shard").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = membership()
    val second = membership()
    assert(first == second, "shard membership changed across reruns")
    assert(first.nonEmpty)
  }
}
