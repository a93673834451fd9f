package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for ITERATIVE operators (connected components,
  * PageRank, BPE training), with a resilience escape hatch.
  *
  * `localCheckpoint(true)` stores blocks on executors — fast, but
  * non-resilient: on a real cluster a lost executor loses blocks that
  * have no lineage left to recompute, killing the job. Long iterative
  * jobs are exactly where executor loss happens, so these operators
  * honor `spark.graft.checkpointDir`: when the conf is set, batches
  * write RELIABLE `checkpoint()`s to that (HDFS/S3) directory instead,
  * and a lost executor re-reads from storage. Unset (the default, and
  * every test/bench path), behavior is unchanged executor-local blocks.
  *
  * The SparkContext checkpoint dir is initialized lazily from the conf
  * on first use; an explicit `sc.setCheckpointDir` made by the caller
  * beforehand wins. (Session-lifetime caches — [[Shared]] — stay
  * executor-local on purpose: they are rebuildable per session, and
  * reliable checkpoint files are not reclaimed until application end.)
  */
object Reliable {

  val ConfKey = "spark.graft.checkpointDir"

  /** Release the blocks behind a checkpointed frame whose content is no
    * longer reachable through any live consumer — the staging relief
    * for multi-step builds whose intermediates otherwise stay resident
    * until session end (the 100× labels-build memory knee). Idempotent;
    * a no-op on non-checkpoint plans and on reliable-checkpoint files
    * (those are reclaimed at application end). The caller owns the
    * safety argument: any LAZY frame still reading the released blocks
    * fails on its next action.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** Truncate `df`'s lineage eagerly: reliably when [[ConfKey]] is set,
    * executor-locally otherwise.
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        // persist first: RDD.checkpoint's write job otherwise RECOMPUTES
        // the whole lineage after the eager count (the standard
        // checkpoint caveat) — every iterative batch would run twice.
        // The cache is dropped as soon as the checkpoint files exist.
        val persisted = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = persisted.checkpoint(true)
        persisted.unpersist()
        out
      case None =>
        df.localCheckpoint(true)
    }
  }
}
