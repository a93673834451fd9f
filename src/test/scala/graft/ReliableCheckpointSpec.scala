package graft

import graft.ops.DedupClusters

/** The `spark.graft.checkpointDir` resilience escape hatch (round-5
  * verdict item 3): iterative operators truncate lineage with
  * executor-local blocks by default, but on a real cluster a lost
  * executor cannot recompute a localCheckpoint — setting the conf
  * switches them to RELIABLE `checkpoint()`s. Results must be identical
  * in both modes, and the reliable mode must actually put a
  * ReliableCheckpointRDD in the lineage.
  */
class ReliableCheckpointSpec extends SparkSuite {
  import spark.implicits._

  // two chains + one star + a self-contained triangle: multi-batch
  // propagation with distinct component minima
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (11L, 12L),
    (20L, 21L), (20L, 22L), (20L, 23L),
    (30L, 31L), (31L, 32L), (30L, 32L)
  ).toDF("src", "dst")

  test("connectedComponents: identical labels under reliable checkpointing") {
    val base = DedupClusters.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.conf.set(Reliable.ConfKey, dir.toString)
    try {
      val rel = DedupClusters.connectedComponents(edges)
      val lineage = rel.rdd.toDebugString
      assert(lineage.contains("ReliableCheckpointRDD"),
        s"no reliable checkpoint in lineage:\n$lineage")
      val got = rel.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(got.sameElements(base),
        s"labels diverged: ${got.toSeq} vs ${base.toSeq}")
      // checkpoint files actually landed in the configured directory
      val wrote = java.nio.file.Files.walk(dir).count() > 1
      assert(wrote, s"no checkpoint files under $dir")
    } finally spark.conf.unset(Reliable.ConfKey)
  }

  test("GlobalOrder: identical ranks under reliable checkpointing") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 5000).map(i => ((i * 2654435761L) % 100000L, i.toLong))
      .toDF("k", "id")
    def ranks() = ops.GlobalOrder.rankAndRunningSum(df,
        Seq(col("k"), col("id")), col("id"), "rnk", "cum", parts = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val base = ranks()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-go")
    spark.conf.set(Reliable.ConfKey, dir.toString)
    try {
      val rel = ops.GlobalOrder.rankAndRunningSum(df,
        Seq(col("k"), col("id")), col("id"), "rnk", "cum", parts = 8)
      val lineage = rel.rdd.toDebugString
      assert(lineage.contains("ReliableCheckpointRDD"),
        s"no reliable checkpoint under GlobalOrder's ranged layout:\n$lineage")
      val got = rel.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(got.sameElements(base), "ranks diverged between checkpoint modes")
    } finally spark.conf.unset(Reliable.ConfKey)
  }

  test("default mode unchanged: executor-local blocks, no reliable RDD") {
    val lineage = DedupClusters.connectedComponents(edges).rdd.toDebugString
    assert(lineage.contains("LocalCheckpointRDD") ||
      lineage.contains("CachedPartitions"),
      s"expected executor-local checkpoint lineage:\n$lineage")
    assert(!lineage.contains("ReliableCheckpointRDD"), lineage)
  }

  test("debugReleases: a stale read of released blocks raises the NAMED error with the release site") {
    // the round-17 misuse guard: release()'s contract is caller-owned
    // ("any lazy frame still reading the released blocks fails on its
    // next action"), and without the conf that failure is an opaque
    // block-not-found deep in a job — under the conf it names the rdd
    // and the graft call site that released it.
    spark.conf.set(Reliable.DebugKey, "true")
    try {
      val base = (1 to 1000).map(_.toLong).toDF("id").localCheckpoint(true)
      val lazyReader = base.selectExpr("sum(id) AS s") // still reads base's blocks
      Reliable.release(base) // the misuse: released under a live lazy consumer
      val e = intercept[Reliable.ReleasedBlockReadException] {
        Reliable.withDiagnosis { lazyReader.collect() }
      }
      assert(e.getMessage.contains("released at"), e.getMessage)
      assert(e.getMessage.contains("ReliableCheckpointSpec"),
        s"diagnosis does not name the release site: ${e.getMessage}")
      assert(e.getCause != null, "original failure must be preserved as the cause")
    } finally spark.conf.unset(Reliable.DebugKey)
  }

  test("debugReleases off (default): release records nothing, withDiagnosis passes failures through") {
    val base = (1 to 1000).map(_.toLong).toDF("id").localCheckpoint(true)
    val lazyReader = base.selectExpr("sum(id) AS s")
    Reliable.release(base)
    val e = intercept[Throwable] {
      Reliable.withDiagnosis { lazyReader.collect() }
    }
    assert(!e.isInstanceOf[Reliable.ReleasedBlockReadException],
      "default mode must not record or rename failures")
    assert(Reliable.diagnose(e).isEmpty)
  }
}
