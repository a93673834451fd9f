package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialization cache for intermediate results shared by
  * several registered queries (common-subexpression reuse across pipeline
  * stages). A dedup pipeline computes MinHash signatures ONCE and feeds
  * both the candidate-pair report (q32) and the cluster resolution (q57);
  * without this, each registry entry would recompute the shingle→hash→
  * signature base from the raw corpus.
  *
  * Entries are `localCheckpoint`ed DataFrames, so the cached plan is a
  * scan of session-lifetime blocks. At 100 TB the shared bases cached here
  * are the REDUCED shapes — signatures (16 longs/doc) and candidate pairs —
  * not raw corpus data, so this is gigabytes where the input is terabytes;
  * for cross-job (not just cross-query) reuse the same seam would write a
  * parquet checkpoint instead.
  *
  * Concurrency: builds run OUTSIDE any map callback — nested shares
  * (minhashCandidates → minhashSigs → …) are plain recursion, never a
  * recursive `computeIfAbsent` update (which the JDK forbids). Two racing
  * threads may both build; `putIfAbsent` keeps the first, the loser's
  * checkpoint is just unused blocks until session end — benign and rare.
  *
  * Lifecycle: the first share in a session registers a SparkListener that
  * drops the session's entries on application end, so a long-lived JVM
  * cycling sessions doesn't retain stopped sessions or their checkpointed
  * block references.
  */
object Shared {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def materialized(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (s, key)
    val existing = cache.get(k)
    if (existing != null) return existing
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
          evictSession(s)
      })
    }
    val built0 = build
    // A build that already returns a materialized checkpoint (one that
    // staged and RELEASED its own intermediates, e.g. minhashCandidates'
    // band table) is stored as-is: re-copying a 25M-row pair set block
    // to block would buy nothing and briefly double the resident set.
    val built = built0.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => built0
      case _ => built0.localCheckpoint(true)
    }
    val prev = cache.putIfAbsent(k, built)
    if (prev != null) prev else built
  }

  /** Evict one entry and release its checkpoint blocks — for pipeline
    * mains that KNOW a shared base has no further consumer in their
    * session (a later query that wants it just rebuilds). Unsafe if any
    * lazy frame still reads the entry's blocks — that is the caller's
    * argument to make.
    */
  def releaseEntry(s: SparkSession, key: String): Unit = {
    val df = cache.remove((s, key))
    if (df != null) Reliable.release(df)
  }

  /** Drop every cached entry belonging to `s`. Called by the listener on
    * application end; exposed for tests (stopping the lone test session
    * would tear down the JVM-shared SparkContext under sibling suites).
    */
  private[graft] def evictSession(s: SparkSession): Unit = {
    cache.keySet.removeIf(e => e._1 eq s)
    hooked.remove(s)
  }

  /** Test hook: keys currently cached for a session. */
  private[graft] def cachedKeys(s: SparkSession): Set[String] = {
    val it = cache.keySet.iterator()
    var out = Set.empty[String]
    while (it.hasNext) { val e = it.next(); if (e._1 eq s) out += e._2 }
    out
  }
}
