package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Proportional-region A/B for [[ops.DedupIndex]]'s corpus-sized band
  * buckets. Every sf0.1-derived rehearsal below ~10M docs sits on the
  * sizing floor (64 buckets), where the corpus-sized layout is
  * byte-identical to the historical fixed-64 one — so the floor
  * rehearsals can only prove "no regression". This bench runs where the
  * proportional region actually engages (`SPARK_GRAFT_SF_DIR` should
  * hold >10M documents, e.g. a 4000x `tools/scale10.py --diversity`
  * dir): it builds the SAME corpus twice — once auto-sized, once with
  * the bucket count pinned to the historical 64 — and times identical
  * small-batch queries against both. Small batches are the case the
  * sizing exists for: a B-doc batch names ≤8·B band buckets, so its
  * pruned read is ≤8·B/buckets of the corpus — bounded by the batch at
  * a corpus-sized count, but corpus/8 (4-doc) to corpus/2 (16-doc) at a
  * fixed 64. Wide batches name most buckets at any count and stay
  * corpus-bound by construction (measured in BENCH.md round 10 — the
  * reason √n sizing lost).
  */
object DedupIndexScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tune(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = graft.TempDirs.create("graft-dixscale")
    def timed(label: String)(body: => Long): Unit = {
      val ts = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.drop(1).map(_._1).sorted.apply(2) // median of 5 post-warmup
      println(f"DIXSCALE $label%-26s ${med}%.3f s (rows=${ts.head._2})")
    }

    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    println(s"DIXSCALE corpus ${n} docs, sized bucket count ${ops.DedupIndex.bucketsFor(n)}")

    // SPARK_GRAFT_DIXSCALE_DIR reuses layouts from a previous run (the
    // builds are ~3 min each at 20M docs; query-path iteration only
    // needs them once)
    val base = sys.env.get("SPARK_GRAFT_DIXSCALE_DIR").getOrElse {
      var t0 = System.nanoTime()
      ops.DedupIndex.write(spark, docs, s"$tmp/sized")
      println(f"DIXSCALE build_sized               ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      ops.DedupIndex.write(spark, docs, s"$tmp/fixed64",
        bucketsOverride = Some(ops.DedupIndex.DefaultBuckets))
      println(f"DIXSCALE build_fixed64             ${(System.nanoTime() - t0) / 1e9}%.3f s")
      tmp
    }

    val probe4 = docs.orderBy(col("doc_id")).limit(4)
      .withColumn("doc_id", col("doc_id") + 900000000L).localCheckpoint()
    val probe16 = docs.orderBy(col("doc_id")).limit(16)
      .withColumn("doc_id", col("doc_id") + 910000000L).localCheckpoint()
    for ((name, probe) <- Seq(("4docs", probe4), ("16docs", probe16));
         (layout, dir) <- Seq(("sized", s"$base/sized"), ("fixed64", s"$base/fixed64"))) {
      timed(s"query_${name}_$layout") {
        ops.DedupIndex.queryBatch(spark, dir, probe).count()
      }
    }
    spark.stop()
  }
}
