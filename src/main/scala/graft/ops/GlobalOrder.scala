package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order primitives — global rank, global running sum
  * and exact NTILE — WITHOUT the `Exchange SinglePartition` funnel that
  * an empty-partition-spec window plans (Spark executes
  * `Window.orderBy(...)` with no `partitionBy` as ONE task holding the
  * whole input; fine at 5k docs, fatal at 10^10).
  *
  * The two-phase form (the recipe range-partitioned sort and
  * `zipWithIndex` use internally; in-repo precedent:
  * [[Dimensional.denseSurrogateKeys]]):
  *
  *  1. `repartitionByRange` on the total order — each of `parts` tasks
  *     holds a contiguous key range. The explicit partition count keeps
  *     AQE from re-planning the exchange, and Spark's `RangePartitioner`
  *     samples with a DETERMINISTIC per-partition seed, so the two jobs
  *     below see identical boundaries.
  *  2. A per-partition partial (count for rank, sum for prefix sums) —
  *     ≤ `parts` rows — is collected to the driver and turned into
  *     exclusive prefix OFFSETS (a partition-count-bounded collect, the
  *     accepted meta-read class; never data-sized).
  *  3. Each partition finishes locally: a window PARTITIONED by the
  *     physical partition id plus the broadcast offset. No operator
  *     anywhere holds more than one partition's rows.
  *
  * Determinism: callers must pass a TOTAL order (tie-broken — every
  * caller here ends on a unique id column). Given that, rank/running sum
  * are unique functions of the data regardless of where the sampled
  * range boundaries land, so the oracle never observes the partitioning.
  */
object GlobalOrder {

  private val Pid = "__go_pid"
  private val Off = "__go_off"

  /** Global 1-based row rank by `order` as LONG column `rankCol`. */
  def rank(df: DataFrame, order: Seq[Column], rankCol: String,
      parts: Int = 32): DataFrame =
    prefixAgg(df, order, lit(1L), rankCol, parts)

  /** Inclusive global running sum of `value` (integral; summed as LONG)
    * in `order`, as column `outCol`.
    */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String, parts: Int = 32): DataFrame =
    prefixAgg(df, order, value, outCol, parts)

  /** Both at once — global rank AND inclusive running sum of `value` in
    * the same total order — for ONE range exchange and ONE partition-
    * local Window node (Spark fuses same-spec window functions), instead
    * of two full two-phase passes.
    */
  def rankAndRunningSum(df: DataFrame, order: Seq[Column], value: Column,
      rankCol: String, sumCol: String, parts: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn(Pid, spark_partition_id())
    val partials = ranged.groupBy(col(Pid))
      .agg(count(lit(1L)).as("pcnt"), sum(value).cast("long").as("psum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var cAcc = 0L; var sAcc = 0L
    val offsets = partials.toSeq.map { case (pid, pcnt, psum) =>
      val o = (pid, cAcc, sAcc); cAcc += pcnt; sAcc += psum; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF(Pid, "__go_coff", "__go_soff")
    val wRank = Window.partitionBy(col(Pid)).orderBy(order: _*)
    val wSum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), Seq(Pid))
      .withColumn(rankCol, row_number().over(wRank).cast("long") + col("__go_coff"))
      .withColumn(sumCol, (sum(value).over(wSum) + col("__go_soff")).cast("long"))
      .drop(Pid, "__go_coff", "__go_soff")
  }

  /** Exact NTILE from a global rank, no window at all: with `n` rows and
    * `b` buckets, SQL NTILE gives the first `n % b` buckets
    * `n div b + 1` rows and the rest `n div b`, so the bucket is a
    * closed form of (rank, n). `rankCol`/`nTotalCol` name LONG columns
    * (the caller broadcast-joins the 1-row total); all arithmetic is
    * integral `div`, exact at any scale.
    */
  def ntileFromRank(df: DataFrame, rankCol: String, nTotalCol: String,
      buckets: Int, outCol: String): DataFrame = {
    val b = buckets.toLong
    df.withColumn(outCol, expr(
      s"""CAST(CASE
         |  WHEN $rankCol <= ($nTotalCol % $b) * ($nTotalCol div $b + 1)
         |  THEN ($rankCol - 1) div ($nTotalCol div $b + 1) + 1
         |  ELSE ($nTotalCol % $b)
         |    + ($rankCol - 1 - ($nTotalCol % $b) * ($nTotalCol div $b + 1))
         |      div greatest($nTotalCol div $b, 1) + 1
         |END AS INT)""".stripMargin))
  }

  private def prefixAgg(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String, parts: Int): DataFrame = {
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn(Pid, spark_partition_id())
    // Partition-count-bounded driver read (≤ `parts` rows).
    val partials = ranged.groupBy(col(Pid))
      .agg(sum(value).cast("long").as("psum"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets = partials.toSeq.map { case (pid, psum) =>
      val o = (pid, acc); acc += psum; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF(Pid, Off)
    val w = Window.partitionBy(col(Pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), Seq(Pid))
      .withColumn(outCol, (sum(value).over(w) + col(Off)).cast("long"))
      .drop(Pid, Off)
  }
}
