package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew remediation for the cases AQE's skew-join rule cannot
  * reach: AQE splits skewed SORT-MERGE partitions at runtime, but it
  * stands down when the skewed side feeds a downstream operator that
  * requires the join's exact partitioning (splitting would force a
  * re-shuffle), in streaming joins, and in bucketed zero-exchange joins.
  * Salting restructures the problem instead: the large side scatters
  * each hot key across `buckets` sub-keys, the small side replicates
  * `buckets`-fold, and the join key becomes (key, salt) — every salted
  * partition carries ≤ 1/buckets of the hottest key.
  *
  * The salt must distribute ROWS of one key, so it derives from the
  * whole large-side row (xxhash64 over all columns), not from the key —
  * a key-derived salt would land the entire hot key in one bucket again.
  * Cost model: small side is materialized `buckets`× (broadcast-sized
  * sides only); the large side is never duplicated. q50 is the
  * aggregation sibling (two-phase salted agg).
  */
object Skew {

  /** Inner equi-join of a skewed large side against a small side,
    * scattered over `buckets` salts. Result set is identical to
    * `large.join(small, largeKey === smallKey)` — salting changes the
    * partitioning, never the semantics (SkewSpec asserts equality).
    */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: Column, smallKey: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(large.col): _*), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated,
        largeKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
