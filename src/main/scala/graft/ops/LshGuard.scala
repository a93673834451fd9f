package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Hot-bucket guard for the LSH band joins (round-5 verdict weak item 2).
  *
  * Every LSH candidate generator in the repo (q32 MinHash bands, q35
  * hyperplane buckets, q141 embedding near-dup bands) self-joins a
  * bucket table on its bucket key — quadratic WITHIN a bucket. On a
  * 100 TB corpus one degenerate signature (a boilerplate template, an
  * all-zeros embedding direction) can put a large corpus fraction into
  * one bucket and turn the equi-join into an accidental cross join.
  *
  * [[capBuckets]] bounds that: members of a bucket are ranked by their
  * id and only the first `cap` generate candidates from that bucket
  * (they can still collide in their other bands). The rank window
  * partitions by the SAME keys as the downstream join, so it reuses the
  * join's shuffle and costs one in-partition sort — O(m log m) against
  * the O(m²) it prevents. Dropped-membership counts are observed via
  * `Dataset.observe` (a CollectMetrics node — zero extra jobs) and
  * logged per query by a session-registered listener, so silent
  * truncation is impossible: a binding cap always leaves a log line.
  *
  * The cap is deliberately a compile-time constant mirrored into the
  * DuckDB oracles (the oracle must express the identical semantics); at
  * the test scale factors no bucket approaches it, so capped results
  * equal uncapped — LshGuardSpec pins both that equality and the
  * degenerate-corpus behavior.
  */
object LshGuard {

  /** Bucket-membership cap. 4096 members still allows ~8.4M candidate
    * pairs from one bucket — far past the similarity-join fan-out any
    * near-dup workload wants, while never binding at test scale.
    */
  val BucketCap = 4096

  // weakly-keyed: a stopped session's listenerManager dies with it, and
  // this set must not be what keeps the session reachable
  private val hooked = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Log observed bucket-drop metrics after each query; idempotent per
    * session. [[lastObserved]] is the matching test seam.
    */
  private def ensureListener(s: SparkSession): Unit =
    if (hooked.add(s)) s.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.lsh.drops.")) {
            val dropped = row.getAs[Long]("dropped")
            val maxBucket = row.getAs[Long]("max_bucket")
            // test seam only — bound it so a long-lived service planning
            // unbounded queries doesn't accrete per-serial entries
            if (lastObserved.size > 1024) lastObserved.clear()
            lastObserved.put(name, (dropped, maxBucket))
            if (dropped > 0)
              System.err.println(
                s"[graft] LSH bucket cap dropped $dropped bucket memberships " +
                  s"($name, largest bucket $maxBucket)")
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })

  /** Last observed (dropped, max_bucket) per metric name — test seam. */
  private[graft] val lastObserved =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  // Metric names carry a per-call serial: two differently-capped guards
  // in ONE query (e.g. comparing capped vs uncapped results) would
  // otherwise be two same-named CollectMetrics nodes with different
  // plans — an analysis error (DUPLICATED_METRICS_NAME).
  private val serial = new java.util.concurrent.atomic.AtomicLong()

  /** Rank-cap bucket membership: partition `df` by `bucketKeys`, order by
    * `orderCol`, keep the first `cap` rows per bucket. Observes the
    * dropped count + largest bucket size as `graft.lsh.drops.$tag`.
    */
  def capBuckets(s: SparkSession, df: DataFrame, bucketKeys: Seq[String],
      orderCol: String, cap: Int = BucketCap, tag: String): DataFrame = {
    ensureListener(s)
    val w = Window.partitionBy(bucketKeys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("graft_bucket_rn", row_number().over(w))
      .observe(s"graft.lsh.drops.$tag#${serial.incrementAndGet()}",
        coalesce(sum(when(col("graft_bucket_rn") > cap, 1L)), lit(0L)).as("dropped"),
        coalesce(max(col("graft_bucket_rn")).cast("long"), lit(0L)).as("max_bucket"))
      .filter(col("graft_bucket_rn") <= cap)
      .drop("graft_bucket_rn")
  }

  /** DuckDB CTE applying the identical cap to a band CTE — `cols` are
    * the carried columns, `keys` the bucket keys, `order` the rank
    * order. Emits `$name AS (...)`.
    */
  def capCteSql(name: String, from: String, cols: Seq[String],
      keys: Seq[String], order: String, cap: Int = BucketCap): String =
    s"""$name AS (
       |  SELECT ${cols.mkString(", ")},
       |    ROW_NUMBER() OVER (PARTITION BY ${keys.mkString(", ")} ORDER BY $order) AS rn
       |  FROM $from QUALIFY rn <= $cap)""".stripMargin
}
