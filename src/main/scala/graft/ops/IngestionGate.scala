package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED streaming ingestion gate — the three persisted-index
  * serve paths chained the way a production corpus intake actually runs
  * them: an arriving document batch is (1) near-dup-checked against the
  * persisted [[DedupIndex]], (2) quality-scored against the persisted
  * [[LmModel]], and (3) the survivors are appended to the dedup index
  * (so the NEXT batch deduplicates against them) and landed in the
  * accepted-corpus sink. The LM model stays frozen — a probability
  * model is versioned per corpus release, not incrementally mutated
  * (see [[LmModel]]'s object doc).
  *
  * Every stage is O(batch + pruned index slice): the dedup check is the
  * band-bucket-pruned [[DedupIndex.queryBatch]], the score is the
  * gram-bucket-pruned [[LmModel.scoreBatch]], and the append is
  * [[DedupIndex.append]]'s idempotent batch write. Nothing in the gate
  * ever scans the corpus, so the same loop that gates 5k documents
  * locally gates a 100 TB corpus's intake stream — per-batch cost
  * tracks the batch.
  *
  * Admission policy: a document is admitted iff it is NOT a near-dup of
  * the live index (max estimated Jaccard < `maxJaccard`) AND it scores
  * at least `minMeanPpm` against the LM. Documents too short to score
  * (< 2 tokens ⇒ no transitions) are rejected — an unscoreable document
  * has no place in a training corpus this gate is guarding.
  *
  * Streaming form: run [[gateBatch]] inside `foreachBatch`
  * ([[graft.streaming.EventStream.toForeachBatch]]) — IngestionGateSpec
  * proves micro-batched streaming execution lands the exact accepted
  * set and index state the same batches produce when applied directly,
  * including the cross-batch property (a near-dup of a document
  * accepted one batch earlier is rejected).
  */
object IngestionGate {

  /** Gate configuration: the two persisted model locations, the
    * accepted-corpus sink, and the admission thresholds.
    */
  case class Config(dedupDir: String, lmDir: String, acceptedDir: String,
    maxJaccard: Double = 0.5, minMeanPpm: Long = 1L)

  /** The pure decision: which of `batch(doc_id, text)` would the gate
    * admit right now, against the CURRENT index state? No writes — this
    * is the serve-latency path IndexBench times, and the unit the
    * mutating [[gateBatch]] composes.
    */
  def decide(s: SparkSession, cfg: Config, batch: DataFrame): DataFrame = {
    val b = batch.localCheckpoint(true) // batch-sized; read by both checks
    val dups = DedupIndex.queryBatch(s, cfg.dedupDir, b)
      .filter(col("est_jaccard") >= cfg.maxJaccard)
      .select(col("batch_id").as("doc_id")).distinct()
    val novel = b.join(dups, Seq("doc_id"), "left_anti")
    // semi-join on the passing scores: a doc the LM could not score
    // (no transitions) is absent from scoreBatch's output and rejected
    val passing = LmModel.scoreBatch(s, cfg.lmDir, novel)
      .filter(col("mean_ppm") >= cfg.minMeanPpm)
      .select(col("doc_id"))
    novel.join(passing, Seq("doc_id"), "left_semi")
  }

  /** One full gate pass: decide, land the admitted documents in the
    * accepted sink, then append them to the dedup index. Made for
    * `foreachBatch`; equally callable as the batch pipeline.
    *
    * At-least-once replay: the dedup index's `sigs` table doubles as
    * the gate's done-marker — a replayed batch's already-admitted docs
    * are anti-joined out (O(batch) semi-join, the [[DedupIndex.append]]
    * pattern), so neither sink re-lands them. The sink write goes
    * FIRST and the marker lands LAST: a crash between the two replays
    * into a duplicate sink row at worst, which [[accepted]] heals on
    * read — the same torn-write seam and heal the index family uses.
    */
  def gateBatch(s: SparkSession, cfg: Config, batch: DataFrame): DataFrame = {
    val decided = decide(s, cfg, batch).localCheckpoint(true)
    val done = s.read.parquet(s"${cfg.dedupDir}/sigs")
      .join(decided.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"))
    val fresh = decided.join(done, Seq("doc_id"), "left_anti").localCheckpoint(true)
    fresh.write.mode("append").parquet(cfg.acceptedDir)
    DedupIndex.append(s, cfg.dedupDir, fresh)
    fresh
  }

  /** The accepted corpus, deduped on read by doc_id — heals the one
    * at-least-once seam (a crash between the sink write and the index
    * append replays into a duplicate sink row).
    */
  def accepted(s: SparkSession, cfg: Config): DataFrame =
    s.read.parquet(cfg.acceptedDir).dropDuplicates("doc_id")
}
