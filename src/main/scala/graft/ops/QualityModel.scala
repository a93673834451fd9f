package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED linear quality classifier — q157/q158's trained scorer in
  * servable form, completing the persisted-model family ([[AnnIndex]],
  * [[TextIndex]], [[DedupIndex]], [[LmModel]]): train once on the
  * released corpus, then score any later ingestion batch at projection
  * cost — no feature-table rebuild, no gradient replays, no corpus.
  *
  * Model layout under `dir`: `model/` is ONE row —
  * (w1, w2, w3, wb, m1, m2, m3, n) — the trained micro-unit weights
  * PLUS the training-corpus feature means. The means are part of the
  * model, not of the batch: a served document is centered with the
  * means the weights were trained against, so its score is a property
  * of the document and the model alone — batch-composition-independent
  * (QualityModelSpec pins a document's score equal when scored alone
  * and alongside arbitrary batch-mates, the property a
  * center-on-the-batch implementation would break).
  *
  * All arithmetic is the ONE q157/q158 recipe
  * ([[Advanced15.lqcRawFeatures]]/[[Advanced15.lqcSig]] — exact
  * micro-unit integers, hard sigmoid), so the spec pins the persisted
  * [[scoreBatch]]'s per-source funnel BIT-IDENTICAL to the live q158 on
  * the training corpus. The keep decision is q158's deterministic
  * md5-hash threshold (keep-rate = score/2), reproducible under reruns
  * and repartitioning.
  *
  * 100 TB shape: training is 1 flat feature projection + 4 bounded-read
  * scans (the q157 cost, paid once per release); the model row is ~64
  * bytes — a literal at serve time, not even a broadcast. Scoring a
  * batch is one codegen'd projection of the batch. Like [[LmModel]],
  * the model is an immutable per-release snapshot — quality models
  * version, they don't mutate.
  */
object QualityModel {

  private val Micro = 1000000L

  /** Train on `docs(doc_id, text, …)` and persist under `dir`.
    * Overwrites.
    */
  def write(s: SparkSession, docs: DataFrame, dir: String): Unit = {
    val raw = Advanced15.lqcRawFeatures(docs).localCheckpoint()
    val (nL, mus) = Advanced15.lqcMeans(raw)
    val x = raw.select(col("y"),
      (col("r1") - mus(0)).as("f1"), (col("r2") - mus(1)).as("f2"),
      (col("r3") - mus(2)).as("f3"))
    val w = Advanced15.lqcTrain(x, nL)
    import s.implicits._
    Seq((w(0), w(1), w(2), w(3), mus(0), mus(1), mus(2), nL))
      .toDF("w1", "w2", "w3", "wb", "m1", "m2", "m3", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/model")
  }

  /** Score `docs(doc_id, text, …)` against the persisted model:
    * (doc_id, score_ppm, keep) in total order. One projection over the
    * batch — the 1-row model is read to the driver and inlined as
    * literals, so the scoring plan has no join at all. `keep` is
    * q158's score-proportional deterministic sample decision
    * (keep-rate = score/2).
    */
  def scoreBatch(s: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val m = s.read.parquet(s"$dir/model").collect()(0)
    val w = Array(m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3))
    val mus = Array(m.getLong(4), m.getLong(5), m.getLong(6))
    val centered = Advanced15.lqcRawFeatures(docs).select(col("doc_id"),
      (col("r1") - mus(0)).as("f1"), (col("r2") - mus(1)).as("f2"),
      (col("r3") - mus(2)).as("f3"))
    centered
      .select(col("doc_id"), Advanced15.lqcSig(w).as("score_ppm"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 25, 7), 16, 10) AS BIGINT) % 1000000")
          .as("hv"))
      .select(col("doc_id"), col("score_ppm"),
        (col("hv") < Det.halfUpDiv(col("score_ppm"), lit(2L))).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** The persisted-classifier SERVE semantics under the hard gate —
    * q159/q153's pattern for the quality model: train on the existing
    * corpus (doc_id < 400), score the arriving delta (doc_id ≥ 400)
    * with the TRAINING means and weights, emit q158's keep decision.
    * This puts the training-mean centering — the property that makes a
    * served score batch-composition-independent — inside the oracle:
    * the oracle centers the delta's raw features with `mu` computed
    * over the TRAINING corpus only, exactly as [[scoreBatch]] does with
    * the persisted means. QualityModelSpec pins a write + scoreBatch
    * roundtrip bit-identical to this live form.
    */
  val incrementalQualityScore = Q(
    "q162_incremental_quality_score",
    (Advanced15.lqcOraclePrefix(
      "(SELECT * FROM documents WHERE doc_id < 400)") + {
      val (r1s, r2s, r3s) = Advanced15.lqcRawSql
      s""",
      |braw AS (
      |  SELECT doc_id,
      |    $r1s AS r1,
      |    $r2s AS r2,
      |    $r3s AS r3
      |  FROM documents WHERE doc_id >= 400),
      |bx AS (SELECT doc_id, r1 - m1 AS f1, r2 - m2 AS f2, r3 - m3 AS f3
      |       FROM braw CROSS JOIN mu),
      |scj AS (SELECT doc_id, (${Advanced15.SigSql}) AS score_ppm,
      |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 7))::BIGINT
      |           % 1000000 AS hv
      |        FROM bx CROSS JOIN w3t)
      |SELECT doc_id, CAST(score_ppm AS BIGINT) AS score_ppm,
      |  hv < ${Advanced15.hudSql("score_ppm", "2")} AS keep
      |FROM scj ORDER BY doc_id""" }).stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val raw = Advanced15.lqcRawFeatures(docs.filter(col("doc_id") < 400))
      .localCheckpoint()
    val (nL, mus) = Advanced15.lqcMeans(raw)
    val x = raw.select(col("y"),
      (col("r1") - mus(0)).as("f1"), (col("r2") - mus(1)).as("f2"),
      (col("r3") - mus(2)).as("f3"))
    val w = Advanced15.lqcTrain(x, nL)
    Advanced15.lqcRawFeatures(docs.filter(col("doc_id") >= 400))
      .select(col("doc_id"),
        (col("r1") - mus(0)).as("f1"), (col("r2") - mus(1)).as("f2"),
        (col("r3") - mus(2)).as("f3"))
      .select(col("doc_id"), Advanced15.lqcSig(w).as("score_ppm"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 25, 7), 16, 10) AS BIGINT) % 1000000")
          .as("hv"))
      .select(col("doc_id"), col("score_ppm"),
        (col("hv") < Det.halfUpDiv(col("score_ppm"), lit(2L))).as("keep"))
      .orderBy(col("doc_id"))
  }

  def specs: Seq[Q] = Seq(incrementalQualityScore)
}
