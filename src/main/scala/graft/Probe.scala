package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: dump formatted physical plans (used to generate
  * PLANS.md). Pass query names as args.
  *
  * Timing mode: set SPARK_GRAFT_PROBE_SF=/root/testdata/sf0.1 to instead
  * time 3 runs of each named query at local[32] (post-JIT timings, no
  * plan dump) — separates real work from Bench's one-shot JIT noise.
  *
  * Final-plan mode: set SPARK_GRAFT_PROBE_FINAL=1 to EXECUTE each query
  * first and print the post-AQE tree (isFinalPlan=true — shows the
  * coalesced/skew-split exchanges the static dump can't), at local[32]
  * with 64 shuffle partitions; SPARK_GRAFT_PROBE_DIR picks the dataset
  * (default sf0.1 in this mode).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val timeSf = sys.env.get("SPARK_GRAFT_PROBE_SF")
    val finalMode = sys.env.contains("SPARK_GRAFT_PROBE_FINAL")
    val cpus = if (timeSf.isDefined || finalMode) "32" else "4"
    val spark = Tune(SparkSession.builder()).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", if (finalMode) "64" else cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q13_join_multihop", "q26_risk_scores",
        "q32_dedup_minhash_lsh", "q34_ann_cosine_topk", "q58_native_topk")
    timeSf match {
      case Some(d) =>
        try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
        names.foreach { n =>
          val ts = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, d).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"PROBE $n%-28s ${ts.map(t => f"$t%.3f").mkString(" ")} s")
        }
      case None if finalMode =>
        val d = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/root/testdata/sf0.1")
        names.foreach { n =>
          println(s"\n================ $n (post-AQE, $d) ================")
          val df = SparkEntry.queries(n)(spark, d)
          // collect() executes THIS QueryExecution (count() would plan a
          // separate aggregate and leave this tree isFinalPlan=false)
          df.collect()
          println(df.queryExecution.executedPlan.toString)
        }
      case None =>
        val d = "/root/testdata/sf0.01"
        names.foreach { n =>
          println(s"\n================ $n ================")
          SparkEntry.queries(n)(spark, d).explain("formatted")
        }
    }
    spark.stop()
  }
}
