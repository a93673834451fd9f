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
  * The salt must distribute ROWS of one key, so it cannot derive from
  * the key alone. Two salt modes, because no single choice is safe AND
  * complete:
  *
  *  - DEFAULT (`scatterDuplicates = false`): hash of the whole row
  *    (xxhash64 over all columns). DETERMINISTIC under task retry and
  *    partial stage recomputation — a refetched map task regenerates
  *    byte-identical salts, so a lost-executor recompute can never drop
  *    or duplicate join rows (the classic rand()-salt correctness trap:
  *    Spark SQL does not roll back whole stages for nondeterministic
  *    projections). Distinct rows of a hot key scatter; BIT-IDENTICAL
  *    duplicate rows share one bucket.
  *  - `scatterDuplicates = true`: mixes `monotonically_increasing_id`
  *    into the hash, scattering even fully-duplicate hot rows. Use it
  *    when duplicates ARE the skew — but only where the large side's
  *    lineage replays deterministically as a whole (e.g. a fresh file
  *    scan, or a localCheckpoint'ed input), because ids assigned during
  *    a PARTIAL recomputation of a shuffled input can differ from the
  *    lost originals, mis-bucketing rows relative to reducers that
  *    already fetched surviving outputs.
  *
  * Cost model: small side is materialized `buckets`× (broadcast-sized
  * sides only); the large side is never duplicated. q50 is the
  * aggregation sibling (two-phase salted agg).
  */
object Skew {

  /** Inner equi-join of a skewed large side against a small side,
    * scattered over `buckets` salts. Result set is identical to
    * `large.join(small, largeKey === smallKey)` — salting changes the
    * partitioning, never the semantics (SkewSpec asserts equality in
    * both modes).
    */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: Column, smallKey: Column, buckets: Int,
      scatterDuplicates: Boolean = false): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // Fresh temp-column name: a caller-owned "__salt" must survive intact.
    val saltCol = Iterator.from(0).map(i => s"__graft_salt$i")
      .find(n => !large.columns.contains(n) && !small.columns.contains(n)).get
    val rowHash =
      if (scatterDuplicates) xxhash64(monotonically_increasing_id())
      else xxhash64(large.columns.map(large.col): _*)
    val salted = large.withColumn(saltCol, pmod(rowHash, lit(buckets.toLong)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated,
        largeKey === smallKey && salted(saltCol) === replicated(saltCol))
      .drop(saltCol)
  }
}
