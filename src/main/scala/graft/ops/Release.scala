package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus release upgrades — incremental index maintenance under corpus
  * versioning: given two corpus versions, compute the id delta once
  * ([[SnapshotDiff.diff]], digest-only join) and roll every persistent
  * serving index forward WITHOUT a from-scratch rebuild.
  *
  * Work per release at 100 TB:
  *  - delta: one digest-only full-outer join (zero-shuffle when the
  *    snapshots are id-bucketed);
  *  - deletes (removed ∪ changed ids): O(batch) tombstone appends;
  *  - ONE compaction per index per release (folds the tombstones in and
  *    frees changed ids for re-append — the tombstone design blocks a
  *    tombstoned id until compaction). Compaction rewrites only the
  *    reduced index tables (postings / 4-byte codes), never the corpus;
  *  - appends (added ∪ changed ids): O(delta) rows semi-joined out of
  *    the new corpus, encoded with the index's frozen quantizers /
  *    serve-time df arithmetic.
  *
  * Equivalence contracts (ReleaseSpec): an upgraded [[TextIndex]] ranks
  * BIT-IDENTICALLY to a fresh build over the new corpus (BM25's df and
  * avgdl are derived at serve time, so append/delete compose exactly).
  * An upgraded [[AnnIndex]] keeps its v1-trained quantizers (the
  * production append contract — periodic [[AnnIndex.write]] rebuilds
  * absorb quantizer drift), so the spec asserts surface properties:
  * removed ids unfindable, changed vectors retrieve their new selves,
  * row parity with the new corpus.
  */
object Release {

  /** Id delta between versions, one single-column (`id`) frame per class.
    * Frames are materialized (localCheckpoint) so the three consumers
    * don't re-run the diff join.
    */
  case class Delta(added: DataFrame, changed: DataFrame, removed: DataFrame) {
    def summary: (Long, Long, Long) = (added.count(), changed.count(), removed.count())
  }

  /** Classify ids across versions by content digest. `digest`/`sizeCol`
    * follow [[SnapshotDiff.diff]]'s contract (unbound columns over each
    * version's schema).
    */
  def delta(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      digest: Column): Delta = {
    val d = SnapshotDiff.diff(oldDf, newDf, idCol, digest, lit(0))
      .select(col(idCol).as("id"), col("status"))
      .filter(col("status") =!= "unchanged")
      .localCheckpoint(true)
    def ids(st: String) = d.filter(col("status") === st).select(col("id"))
    Delta(ids("added"), ids("changed"), ids("removed"))
  }

  /** Roll a persisted [[TextIndex]] from the old corpus to `newCorpus`:
    * tombstone removed ∪ changed, compact once, append added ∪ changed
    * rows semi-joined from the new corpus. Returns the upgraded index —
    * bit-identical to `TextIndex.write` over `newCorpus` (spec-pinned).
    */
  def upgradeTextIndex(s: SparkSession, dir: String, newCorpus: DataFrame,
      d: Delta): TextIndex.Index = {
    val gone = d.removed.unionByName(d.changed).select(col("id").as("doc_id"))
    TextIndex.delete(s, dir, gone)
    TextIndex.compact(s, dir)
    val freshIds = d.added.unionByName(d.changed).select(col("id").as("doc_id"))
    TextIndex.append(s, dir, newCorpus.join(freshIds, Seq("doc_id"), "left_semi"))
  }

  /** Roll a persisted [[AnnIndex]] to `newVectors(vec_id, v)`: tombstone
    * removed ∪ changed, compact once, append added ∪ changed vectors
    * encoded with the index's frozen quantizers.
    */
  def upgradeAnnIndex(s: SparkSession, dir: String, newVectors: DataFrame,
      d: Delta): AnnIndex.Index = {
    val gone = d.removed.unionByName(d.changed).select(col("id").as("vec_id"))
    AnnIndex.delete(s, dir, gone)
    AnnIndex.compact(s, dir)
    val freshIds = d.added.unionByName(d.changed).select(col("id").as("vec_id"))
    AnnIndex.append(s, dir, newVectors.join(freshIds, Seq("vec_id"), "left_semi"))
  }

  /** Roll a persisted [[DedupIndex]] to `newCorpus`: same
    * delete-compact-append recipe. The signature hash is stateless (no
    * trained quantizer), so the upgraded index is EXACTLY a fresh
    * `DedupIndex.write` over `newCorpus` — ReleaseSpec pins
    * bit-identical [[DedupIndex.queryBatch]] results.
    */
  def upgradeDedupIndex(s: SparkSession, dir: String, newCorpus: DataFrame,
      d: Delta): DedupIndex.Index = {
    val gone = d.removed.unionByName(d.changed).select(col("id").as("doc_id"))
    DedupIndex.delete(s, dir, gone)
    DedupIndex.compact(s, dir)
    val freshIds = d.added.unionByName(d.changed).select(col("id").as("doc_id"))
    DedupIndex.append(s, dir, newCorpus.join(freshIds, Seq("doc_id"), "left_semi"))
  }
}
