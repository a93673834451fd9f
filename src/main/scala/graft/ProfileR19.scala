package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only (round 19): per-Spark-job trace of a named query's steady
  * invocation — job wall-clock, description and stage count — so a
  * multi-second query decomposes into its actual job list instead of a
  * stage-level guess. Args: query names; env SPARK_GRAFT_PROBE_SF picks
  * the data dir (default sf0.1). Runs each query twice (warm) and
  * traces the SECOND run.
  */
object ProfileR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_SF", "/root/testdata/sf0.1")
    val spark = Tune(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    plans.TopKRewriteInstall.ensureInstalled(spark)

    case class J(id: Int, var desc: String = "", var start: Long = 0L,
      var end: Long = 0L, var nStages: Int = 0,
      stages: scala.collection.mutable.ArrayBuffer[String] =
        scala.collection.mutable.ArrayBuffer.empty)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var tracing = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (tracing) {
        val j = J(js.jobId)
        j.desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))).getOrElse("?")
        j.start = js.time
        j.nStages = js.stageIds.size
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
        jobs.put(js.jobId, j)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (tracing) {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (tracing) {
        val si = sc.stageInfo
        Option(stageToJob.get(si.stageId)).flatMap(jid => Option(jobs.get(jid)))
          .foreach { j =>
            val ms = (for {a <- si.completionTime; b <- si.submissionTime}
              yield a - b).getOrElse(-1L)
            j.stages += s"[${si.stageId}] ${ms}ms tasks=${si.numTasks} ${si.name.take(90)}"
          }
      }
    })

    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // A/B mode: SPARK_GRAFT_PROFILE_AB_CONF="k=v;k2=v2" — run each query
    // warm, then 3 alternated (base, conf) pairs, printing both series.
    val abConf: Seq[(String, String)] = sys.env.get("SPARK_GRAFT_PROFILE_AB_CONF")
      .toSeq.flatMap(_.split(";")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    if (abConf.nonEmpty) {
      args.foreach { name =>
        val base = abConf.map { case (k, _) => (k, spark.conf.getOption(k)) }
        def setConf(): Unit = abConf.foreach { case (k, v) => spark.conf.set(k, v) }
        def unsetConf(): Unit = base.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
        SparkEntry.queries(name)(spark, sfDir).count() // warm
        val times = (1 to 3).flatMap { _ =>
          unsetConf()
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          val a = (System.nanoTime() - t0) / 1e9
          setConf()
          val t1 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          val b = (System.nanoTime() - t1) / 1e9
          Seq(("base", a), ("conf", b))
        }
        unsetConf()
        val bs = times.filter(_._1 == "base").map(_._2)
        val cs = times.filter(_._1 == "conf").map(_._2)
        def f(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(" ")
        println(f"\nAB $name base=[${f(bs)}] conf=[${f(cs)}] " +
          f"medians ${bs.sorted.apply(1)}%.3f vs ${cs.sorted.apply(1)}%.3f")
      }
      spark.stop(); return
    }
    args.foreach { name =>
      // run 1: warm (builds any session-shared state)
      val tW0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val warm = (System.nanoTime() - tW0) / 1e9
      // run 2: traced steady
      jobs.clear(); tracing = true
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val steady = (System.nanoTime() - t0) / 1e9
      tracing = false
      println(f"\n==== $name warm=$warm%.3f steady=$steady%.3f s ====")
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.id)
      val totalJobMs = js.map(j => math.max(0L, j.end - j.start)).sum
      println(s"jobs=${js.size} sum(job wall)=${totalJobMs} ms")
      js.foreach { j =>
        println(f"  job ${j.id}%4d ${math.max(0L, j.end - j.start)}%6d ms stages=${j.nStages}%2d  ${j.desc.take(110)}")
        if (j.end - j.start > 300) j.stages.foreach(s => println(s"         $s"))
      }
    }
    spark.stop()
  }
}
