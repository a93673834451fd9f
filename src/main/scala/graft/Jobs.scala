package graft

import org.apache.spark.sql.SparkSession

/** Job labeling (guide §1.5): wrap an operator phase so every Spark job
  * it launches carries a readable description in the UI / listeners —
  * the round-19 profiling showed a 60-job serve path is unattributable
  * without them. Descriptions are thread-local; the previous value is
  * restored so labels nest and never leak into caller jobs.
  */
object Jobs {
  def labeled[A](s: SparkSession, label: String)(body: => A): A = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body
    finally sc.setJobDescription(prev)
  }
}
