package graft.ops

/** Shared tombstone-ledger policy for the persisted-index family
  * ([[AnnIndex]], [[TextIndex]], [[DedupIndex]]). Each index's `delete`
  * appends ids to a `tombstones/` parquet ledger that `load` anti-joins
  * (broadcast) onto every serve surface — O(batch) deletes, but the
  * ledger grows unboundedly between compacts.
  */
object Tombstones {

  /** Auto-compact threshold: when a delete pushes the ledger past this
    * many rows, the index compacts inline instead of returning a
    * loaded view over an ever-growing broadcast side. One million
    * 8-byte ids ≈ 8 MB — comfortably inside Spark's 10 MB default
    * broadcast threshold with headroom for row overhead, and a
    * compaction every million deletes amortizes the rewrite to noise.
    * Tests override the per-call parameter to exercise the trip wire
    * with small ledgers.
    */
  val AutoCompactRows = 1000000L
}
