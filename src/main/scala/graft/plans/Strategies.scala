package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** Idempotent, RACE-FREE installation of planner strategies on a live
  * session. `spark.experimental.extraStrategies` is a plain mutable var,
  * so the obvious check-then-append is not atomic: two threads planning
  * their first AsOf/TopK query on one session could each pass the
  * `contains` check and append, growing planner state on every race.
  * Duplicates are semantically harmless (the strategy is a pure partial
  * function) but unbounded growth under a long-lived multi-tenant session
  * is not — so the check+append runs under one global lock. Sessions
  * built with [[graft.GraftExtensions]] get both strategies injected at
  * build time and never take this path.
  */
object Strategies {
  private val lock = new Object

  def ensureInstalled(spark: SparkSession, strategy: SparkStrategy): Unit =
    lock.synchronized {
      if (!spark.experimental.extraStrategies.contains(strategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ strategy
      }
    }
}
