package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Proportional-region A/B for [[ops.TextIndex]]'s and [[ops.LmModel]]'s
  * corpus-sized bucket counts — [[DedupIndexScaleBench]]'s recipe on the
  * other two bucketed layouts. `SPARK_GRAFT_SF_DIR` should hold a
  * `--diversity` rehearsal dir big enough that [[ops.TextIndex.bucketsFor]]
  * leaves its 64 floor (≥ 2.56M docs at 40k docs/bucket — e.g. the
  * 1000x dir, 5M docs → 125 buckets); diversity matters because
  * verbatim copies leave the vocabulary 1x, which multiplies posting
  * LIST length instead of bucket COUNT pressure.
  *
  * Each index family builds the SAME corpus twice — auto-sized and
  * pinned to the historical fixed 64 — and serves identical queries
  * from both. The open question from round 10 (BENCH.md): text serve
  * reads are term-named, so the `term IN (…)` predicate row-group-prunes
  * WITHIN a bucket — the sized layout may buy nothing that pushdown
  * doesn't already. The LM's proportional region (> 64M distinct
  * bigrams at 1M grams/bucket) is unreachable locally (~70,000x
  * diversity), so its A/B pins an OVERRIDE count well past the floor
  * (256) against 64 at the largest buildable model — measuring whether
  * bucket granularity moves serve latency at all, the curve the sizing
  * threshold sits on.
  *
  * `SPARK_GRAFT_TLSCALE_SECTIONS=text,lm` selects families.
  */
object TextLmScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sections = sys.env.get("SPARK_GRAFT_TLSCALE_SECTIONS")
      .map(_.split(",").map(_.trim).toSet)
    def section(name: String)(body: => Unit): Unit =
      if (sections.forall(_.contains(name))) body
    val spark = Tune(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import ops.{LmModel, TextIndex}

    val tmp = graft.TempDirs.create("graft-tlscale")
    def timed(label: String)(body: => Long): Unit = {
      val ts = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.drop(1).map(_._1).sorted.apply(2) // median of 5 post-warmup
      println(f"TLSCALE $label%-28s ${med}%.3f s (rows=${ts.head._2})")
    }

    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    println(s"TLSCALE corpus ${n} docs, text sized bucket count ${ops.TextIndex.bucketsFor(n)}")

    section("text") {
      // SPARK_GRAFT_TLSCALE_DIR reuses layouts from a previous run
      // (the double build dominates the wall at 5M docs)
      val base = sys.env.get("SPARK_GRAFT_TLSCALE_DIR").getOrElse {
        var t0 = System.nanoTime()
        TextIndex.writeDocs(spark, docs, s"$tmp/text_sized")
        println(f"TLSCALE text_build_sized           ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
        TextIndex.writeDocs(spark, docs, s"$tmp/text_fixed64",
          bucketsOverride = Some(ops.TextIndex.DefaultBuckets))
        println(f"TLSCALE text_build_fixed64         ${(System.nanoTime() - t0) / 1e9}%.3f s")
        tmp
      }
      // the diversity remap leaves copy-0 tokens unchanged and makes
      // copy-i tokens "tok~i" — query both shapes: 1x-length posting
      // lists living in corpus-sized bucket directories (the pruned-read
      // question in its purest form)
      for ((layout, dir) <- Seq(("sized", s"$base/text_sized"),
          ("fixed64", s"$base/text_fixed64"))) {
        val ix = TextIndex.load(spark, dir)
        timed(s"bm25_3terms_$layout") {
          TextIndex.search(spark, ix, Seq("dup", "vector", "spark"), 10).count()
        }
        timed(s"bm25_remap_$layout") {
          TextIndex.search(spark, ix, Seq("dup~7", "vector~7", "spark~7"), 10).count()
        }
        timed(s"phrase_2terms_$layout") {
          TextIndex.phraseSearch(spark, ix, Seq("table", "hash")).count()
        }
      }
    }

    section("lm") {
      var t0 = System.nanoTime()
      LmModel.write(spark, docs, s"$tmp/lm_256", bucketsOverride = Some(256))
      println(f"TLSCALE lm_build_256               ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      LmModel.write(spark, docs, s"$tmp/lm_64", bucketsOverride = Some(64))
      println(f"TLSCALE lm_build_64                ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val probe100 = docs.orderBy(col("doc_id")).limit(100)
        .withColumn("doc_id", col("doc_id") + 2000000000L).localCheckpoint()
      for (nB <- Seq(256, 64)) {
        timed(s"lm_score_100docs_$nB") {
          LmModel.scoreBatch(spark, s"$tmp/lm_$nB", probe100).count()
        }
      }
    }
    spark.stop()
  }
}
