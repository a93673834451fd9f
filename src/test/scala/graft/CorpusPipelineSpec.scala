package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end corpus build on a crafted corpus where every gate has a
  * victim: a degenerate repetitive doc (quality), an exact duplicate
  * (dedup keeps the smaller id), a train doc leaking a held-out doc's
  * 5-gram (decontamination; doc_id 8 md5-buckets into the val split),
  * and a rerun that must reproduce identical shard membership.
  */
class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_corpus_fixture").toString
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val leak = "shared secret benchmark answer phrase"
    val rainbow = "red orange yellow green blue indigo violet pink brown white"
    val docs = Seq(
      (0L, good, "en", "src0", 60L),
      (1L, good, "en", "src1", 60L),                                     // exact dup of 0
      (2L, "spark spark spark spark spark spark spark spark", "en", "src0", 47L), // repetitive
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es", "src2", 52L),
      (4L, "one two three four five six seven eight nine ten", "en", "src3", 49L),
      (5L, s"$leak plus unique train padding words here", "en", "src0", 75L), // leaks doc 8's gram
      (8L, s"$leak with other held out eval context tokens", "en", "src0", 80L), // val-split doc
      // near-dup pair where the LONGER member has the HIGHER doc_id:
      // doc 10 is doc 9 repeated (9/10 shared shingles -> LSH candidates),
      // so keep-best must invert the old min-id rule and keep 10.
      (9L, rainbow, "en", "src4", 60L),
      (10L, s"$rainbow $rainbow", "en", "src4", 121L),
      // SEMANTIC duplicates: zero lexical overlap (no shared tokens or
      // shingles, so exact dedup and MinHash both pass them), but their
      // embeddings below are parallel vectors in one cluster — only the
      // semantic stage can catch the pair; q133 semantics keep doc 11.
      (11L, "lunar orbit transfer requires patient staging maneuvers always", "en", "src0", 62L),
      (12L, "cats quietly dominate suburban households through strategic napping", "en", "src0", 67L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    Seq(
      (11L, Array(0.6f, 0.8f, 0.0f, 0.0f), 7),
      (12L, Array(0.6f, 0.8f, 0.0f, 0.0f), 7),  // cosine 1.0 with doc 11
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f), 7))   // same cluster, orthogonal: survives
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("quality, dedup, and decontamination gates all fire on their victims") {
    val out = Files.createTempDirectory("graft_corpus_out").toString
    val shards = CorpusPipeline.run(spark, dir, out)
    val ids = shards.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L), "repetitive doc survived the quality gate")
    assert(!ids.contains(1L), "exact duplicate survived (should keep doc 0)")
    // doc 0 kept over its duplicate; src2/src3 docs subject only to mixture
    assert(ids.contains(0L))
    // doc 8 lands in val (md5 split bucket 93) and doc 5 (train) shares
    // its 5-gram -> decontamination drops 5, keeps 8
    assert(ids.contains(8L), "held-out doc should survive")
    assert(!ids.contains(5L), "contaminated train doc survived decontamination")
    // keep-best purge: the LONGER near-dup survives even with the higher id
    assert(ids.contains(10L), "keep-best should keep the longer near-dup")
    assert(!ids.contains(9L), "shorter near-dup member survived the purge")
    // semantic dedup: docs 11/12 share no tokens (lexical stages blind)
    // but have parallel embeddings in one cluster — 12 drops, 11 stays,
    // and the orthogonal clustermate (doc 4) is untouched
    assert(ids.contains(11L), "semantic keeper should survive")
    assert(!ids.contains(12L), "semantic duplicate survived the embedding stage")
    assert(ids.contains(4L), "orthogonal clustermate wrongly dropped")
    val splits = shards.select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(splits(8L) == "val", splits.toString)
    // every surviving row carries split/pack metadata
    val cols = shards.columns.toSet
    assert(Set("split", "pack_id", "shard").subsetOf(cols), cols.toString)
    // the run report published both artifacts with sane values
    val card = spark.read.parquet(s"$out-report/card").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bpe_tokens"))).toMap
    assert(card.values.map(_._1).sum == ids.size.toLong, card.toString)
    // every shipped doc has at least one token per word under the table
    assert(card.values.forall(_._2 > 0L), card.toString)
    val drift = spark.read.parquet(s"$out-report/drift").collect()(0)
    assert(drift.getAs[Long]("n_a") == 11L)           // raw corpus size
    assert(drift.getAs[Long]("n_b") == ids.size.toLong)
    val ks = drift.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0, ks.toString)       // dropped docs shift the ECDF
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

  test("reducer derivation: cores floor, ~1250 docs/reducer, 4096 cap") {
    // the round-17 calibration points (BENCH.md): a small corpus keeps
    // the pre-derivation behavior (reducers = cores); 500k docs at 32
    // cores lands 400 (margin past the measured 256-edge of the
    // 0.25 GB/core regime); the cap bounds tiny-task overhead
    assert(CorpusPipeline.deriveReducers(5000L, 4) == 4)      // 1x: clamps to cores
    assert(CorpusPipeline.deriveReducers(5000L, 32) == 32)
    assert(CorpusPipeline.deriveReducers(500000L, 32) == 400) // 100x rehearsal
    assert(CorpusPipeline.deriveReducers(50000000L, 32) == 4096) // cap
    assert(CorpusPipeline.deriveReducers(0L, 16) == 16)
  }

  test("task-cpus derivation: >=768MB heap per concurrent task, 1 on healthy configs") {
    val g = 1024L * 1024 * 1024
    assert(CorpusPipeline.deriveTaskCpus(8 * g, 32) == 3)   // 0.25 GB/core -> 10 concurrent
    assert(CorpusPipeline.deriveTaskCpus(8 * g, 16) == 2)   // 0.5 GB/core -> 8 concurrent
    assert(CorpusPipeline.deriveTaskCpus(16 * g, 32) == 2)
    assert(CorpusPipeline.deriveTaskCpus(16 * g, 16) == 1)  // 1 GB/core -> unchanged
    assert(CorpusPipeline.deriveTaskCpus(24 * g, 32) == 1)
    assert(CorpusPipeline.deriveTaskCpus(g / 4, 4) == 4)    // degenerate: one task at a time
  }
}
