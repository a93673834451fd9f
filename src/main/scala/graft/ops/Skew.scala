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
  * The salt must distribute ROWS of one key, so it mixes a per-row
  * component (`monotonically_increasing_id` — unique per row regardless
  * of content) into the hash rather than deriving from the key alone: a
  * key-derived salt would land the entire hot key in one bucket again,
  * and a content-derived salt (xxhash64 of the columns) re-collides on
  * FULLY-DUPLICATE hot rows — the most common real skew shape. The salt
  * never appears in the output, so its run-to-run nondeterminism is
  * invisible (the join result set is identical either way).
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
    // Fresh temp-column name: a caller-owned "__salt" must survive intact.
    val saltCol = Iterator.from(0).map(i => s"__graft_salt$i")
      .find(n => !large.columns.contains(n) && !small.columns.contains(n)).get
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated,
        largeKey === smallKey && salted(saltCol) === replicated(saltCol))
      .drop(saltCol)
  }
}
