package graft.ops

import graft.Det
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
}
