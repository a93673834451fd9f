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
  *  - appends (added ∪ changed ids): O(delta) rows semi-joined out of
  *    the new corpus, encoded with the index's frozen quantizers /
  *    serve-time df arithmetic.
  *
  * Text/dedup upgrades are O(delta) END TO END on epoch-aware layouts
  * ([[Tombstones]]): a tombstone records the epoch it was laid at, so
  * changed ids re-append at a fresh epoch WITHOUT a compaction, and the
  * table rewrite amortizes across releases via the auto-compact
  * threshold instead of landing on every one. That replaces the
  * original compact-per-release recipe, which BENCH.md round 10
  * measured REBUILD-PRICED for text/dedup (the postings/bands rewrite
  * is corpus-order I/O — the one linear term dominated everything the
  * delta math saved). Legacy (pre-epoch) layouts keep the eager
  * compact, which also upgrades them in place. ANN keeps
  * compact-per-release deliberately: its compaction rewrites 4-byte
  * codes (a genuinely reduced table, 100-1000× smaller I/O than the
  * vectors) and the upgrade already beats a fresh rebuild because the
  * frozen quantizers skip the Lloyd retrain (measured 3.7 vs 4.6 s).
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
    * tombstone removed ∪ changed, then append added ∪ changed rows
    * semi-joined from the new corpus — O(delta) on an epoch layout (no
    * compaction; see object doc), with the eager compact kept only for
    * legacy layouts (where it is required for the re-append AND
    * upgrades the layout in place). Returns the upgraded index —
    * bit-identical to `TextIndex.write` over `newCorpus` (spec-pinned).
    */
  def upgradeTextIndex(s: SparkSession, dir: String, newCorpus: DataFrame,
      d: Delta): TextIndex.Index = {
    val gone = d.removed.unionByName(d.changed).select(col("id").as("doc_id"))
    val epochMode = TextIndex.isEpochLayout(s, dir)
    TextIndex.delete(s, dir, gone)
    if (!epochMode) TextIndex.compact(s, dir)
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

  /** Roll a persisted [[DedupIndex]] to `newCorpus`: tombstone, then
    * append — O(delta) on an epoch layout, eager compact only for
    * legacy layouts (as in [[upgradeTextIndex]]). The signature hash is
    * stateless (no trained quantizer), so the upgraded index serves
    * EXACTLY as a fresh `DedupIndex.write` over `newCorpus` —
    * ReleaseSpec pins bit-identical [[DedupIndex.queryBatch]] results.
    */
  def upgradeDedupIndex(s: SparkSession, dir: String, newCorpus: DataFrame,
      d: Delta): DedupIndex.Index = {
    val gone = d.removed.unionByName(d.changed).select(col("id").as("doc_id"))
    val epochMode = DedupIndex.isEpochLayout(s, dir)
    DedupIndex.delete(s, dir, gone)
    if (!epochMode) DedupIndex.compact(s, dir)
    val freshIds = d.added.unionByName(d.changed).select(col("id").as("doc_id"))
    DedupIndex.append(s, dir, newCorpus.join(freshIds, Seq("doc_id"), "left_semi"))
  }

  /** Roll a persisted [[LmModel]] to `newCorpus` by exact count
    * algebra: subtract the removed ∪ changed docs' OLD transition
    * counts (which is why this upgrade, unlike the index ones, needs
    * `oldCorpus` — tombstoning by id cannot un-count content), add the
    * added ∪ changed docs' new counts. Counts are additive longs, so
    * the upgraded model is BIT-IDENTICAL to a fresh train over
    * `newCorpus` (ReleaseSpec pins scoreBatch equality). Cost: two
    * snapshot semi-joins (checkpointed batch-sized), delta
    * tokenization, one model-table-sized merge — never a corpus scan.
    */
  def upgradeLmModel(s: SparkSession, dir: String, oldCorpus: DataFrame,
      newCorpus: DataFrame, d: Delta): Unit = {
    val gone = d.removed.unionByName(d.changed).select(col("id").as("doc_id"))
    val freshIds = d.added.unionByName(d.changed).select(col("id").as("doc_id"))
    // batch-sized materialization: LmModel.upgrade scans each delta side
    // twice (bigram + unigram counts) — without the checkpoint each scan
    // would re-run the semi-join over the full snapshot
    val rem = oldCorpus.join(gone, Seq("doc_id"), "left_semi").localCheckpoint(true)
    val add = newCorpus.join(freshIds, Seq("doc_id"), "left_semi").localCheckpoint(true)
    LmModel.upgrade(s, dir, addDocs = add, removeDocs = rem)
  }
}
