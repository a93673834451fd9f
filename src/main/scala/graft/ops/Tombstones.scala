package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone-ledger policy for the persisted-index family
  * ([[AnnIndex]], [[TextIndex]], [[DedupIndex]]). Each index's `delete`
  * appends ids to a `tombstones/` parquet ledger that `load` folds
  * (broadcast) onto every serve surface — O(batch) deletes, but the
  * ledger grows unboundedly between compacts.
  *
  * EPOCH-AWARE tombstones (round 10): layouts written by the current
  * `write`/`compact` stamp every data row with the batch's epoch (`ep`,
  * a monotone long handed out by the `epoch/` one-row marker), and
  * tombstones record the epoch they were laid at (`te`). A row is live
  * iff `ep > te` of its id's newest tombstone — so delete-then-reappend
  * of an id works WITHOUT a compaction: the re-appended rows carry a
  * higher epoch than the tombstone that killed the old ones. This is
  * what makes a corpus-release upgrade O(delta): the eager
  * compact-per-release (measured rebuild-priced on text/dedup — the
  * postings/bands rewrite is corpus-order I/O, BENCH.md round 10) is
  * replaced by the [[AutoCompactRows]] amortization. The marker is
  * bumped BEFORE a batch's data lands, so a tombstone laid at the
  * current marker always covers every row already written; the
  * remaining at-least-once caveat (shared with the pre-epoch design) is
  * that interleaving a delete between an append's crash and its replay
  * re-lands the batch — the single-writer intake contract replays a
  * failed batch before proceeding.
  *
  * Layouts written before the epoch column existed (no `ep` in the
  * data, id-only tombstones) keep the legacy semantics end-to-end:
  * anti-join liveness, re-append blocked until compact — and a compact
  * upgrades them to the epoch layout in place.
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

  /** Highest epoch handed out for writing at `dir` — 0 if no marker
    * exists (fresh or legacy layout). Falls back to the staging copy
    * ([[writeEpoch]]'s `epoch.tmp`) when the final marker is missing: a
    * crash between writeEpoch's delete and rename leaves exactly that
    * state, and the staging copy was fully written before the delete —
    * without the fallback the epoch would silently reset to 0, letting
    * later tombstones land at te=0 (never killing live rows) and
    * re-appends land at-or-below existing tombstone epochs (wrongly
    * dead). Unlike the torn-append seam, batch replay does not heal an
    * epoch reset, so the marker write itself must be crash-safe.
    */
  def readEpoch(s: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/epoch")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/epoch.tmp")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // footer-stats fast path (MetaScalar, round 18): the marker is a
    // coalesce(1) one-row write, so min==max==value in the file footer
    // — a driver-side read instead of a Spark job per epoch check
    if (fs.exists(p))
      MetaScalar.scalarLong(s, p.toString, "epoch")
        .getOrElse(s.read.parquet(p.toString).collect()(0).getLong(0))
    else if (fs.exists(tmp))
      MetaScalar.scalarLong(s, tmp.toString, "epoch")
        .getOrElse(s.read.parquet(tmp.toString).collect()(0).getLong(0))
    else 0L
  }

  /** Persist the epoch marker (one driver-side row — never races a
    * concurrent read of itself) crash-safely: stage the new value at
    * `epoch.tmp`, then delete-and-rename into place. Every intermediate
    * crash state is recoverable — a torn staging write leaves the old
    * final marker intact, and a crash after the delete leaves the
    * COMPLETE staging copy, which [[readEpoch]] falls back to.
    */
  def writeEpoch(s: SparkSession, dir: String, e: Long): Unit = graft.Jobs.labeled(s, "tombstones: writeEpoch") {
    import s.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$dir/epoch")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/epoch.tmp")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(e).toDF("epoch").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  /** Hand out the next epoch for an append batch: bump the marker FIRST
    * (see object doc), then return the bumped value for the data rows.
    */
  def bumpEpoch(s: SparkSession, dir: String): Long = {
    val next = readEpoch(s, dir) + 1L
    writeEpoch(s, dir, next)
    next
  }

  /** The newest tombstone epoch per id — the broadcast side of every
    * epoch-aware liveness join. None when no ledger exists.
    */
  def tombMax(s: SparkSession, dir: String, idCol: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    if (p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)) {
      val raw = s.read.parquet(p.toString)
      // a legacy (te-less) ledger row kills the id at EVERY epoch —
      // exactly the pre-epoch anti-join semantics it was written under
      val te = if (raw.columns.contains("te")) raw
        else raw.withColumn("te", lit(Long.MaxValue))
      Some(te.groupBy(col(idCol)).agg(max(col("te")).as("te")))
    } else None
  }

  /** Epoch-aware liveness: keep rows whose `ep` postdates their id's
    * newest tombstone (or that have no tombstone at all). Same
    * broadcast-join cost class as the legacy anti-join.
    */
  def liveByEpoch(df: DataFrame, tomb: Option[DataFrame],
      idCol: String): DataFrame =
    tomb.fold(df) { t =>
      df.join(broadcast(t), Seq(idCol), "left")
        .filter(col("te").isNull || col("ep") > col("te"))
        .drop("te")
    }
}
