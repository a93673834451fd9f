package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Deterministic sampling — the training-data rebalancing step. `rand()`
  * sampling is irreproducible across retries/partitions; hash-threshold
  * sampling (keep iff h(doc) < rate) is stable under re-execution,
  * partitioning, AND incremental reruns — the property a 100 TB corpus
  * pipeline needs so a resumed job samples identically. Hash derives from
  * the md5-prefix trick so the oracle computes the same sample.
  */
object Sampling {

  /** Language-balanced corpus sample: each language capped at ~80 docs
    * via per-language keep-rate = min(1, 80/n); membership decided by a
    * per-document hash in [0,1). Output: per-language before/after counts
    * plus the realized rate.
    */
  val balancedSample = Q(
    "q60_balanced_sample",
    """WITH counts AS (
      |  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      |hashed AS (
      |  SELECT d.doc_id, d.lang, c.n_docs,
      |    (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT % 10000) / 10000.0 AS h,
      |    LEAST(1.0, 80.0 / c.n_docs) AS keep_rate
      |  FROM documents d JOIN counts c USING (lang))
      |SELECT lang,
      |  MAX(n_docs) AS n_before,
      |  COUNT(CASE WHEN h < keep_rate THEN 1 END) AS n_sampled,
      |  ROUND(MAX(keep_rate), 6) AS keep_rate
      |FROM hashed
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    docs.join(broadcast(counts), Seq("lang"))
      .withColumn("h",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 10000") / 10000.0)
      .withColumn("keep_rate", least(lit(1.0), lit(80.0) / col("n_docs")))
      .groupBy(col("lang"))
      .agg(max(col("n_docs")).as("n_before"),
        count(when(col("h") < col("keep_rate"), 1)).as("n_sampled"),
        round(max(col("keep_rate")), 6).as("keep_rate"))
      .orderBy(col("lang"))
  }

  /** Probability-proportional-to-size sampling: keep each doc with
    * p = min(1, target·w/Σw) where the weight is its size — the
    * token-budget sample that favors long documents (inclusion
    * probability ∝ contributed tokens, so the sample's token mass
    * concentrates where the training signal is). Same deterministic
    * hash-membership as q60: reruns, repartitions, and incremental
    * extensions keep the identical sample. One broadcast 1-row total +
    * one narrow projection — no shuffle of the corpus.
    */
  val weightedSample = Q(
    "q121_weighted_sample",
    """WITH t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM documents),
      |h AS (
      |  SELECT d.doc_id, d.source, d.n_chars,
      |    (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT % 1000000)
      |      / 1000000.0 AS hv,
      |    LEAST(1.0, 100.0 * d.n_chars / t.total) AS p
      |  FROM documents d CROSS JOIN t)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(CASE WHEN hv < p THEN 1 END) AS BIGINT) AS n_sampled,
      |  CAST(COALESCE(SUM(n_chars) FILTER (WHERE hv < p), 0) AS BIGINT) AS sampled_chars,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM h
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val total = docs.agg(sum(col("n_chars")).as("total"))
    docs.crossJoin(broadcast(total))
      .withColumn("hv",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 1000000") / 1000000.0)
      .withColumn("p", least(lit(1.0), lit(100.0) * col("n_chars") / col("total")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("hv") < col("p"), 1)).as("n_sampled"),
        coalesce(sum(when(col("hv") < col("p"), col("n_chars"))), lit(0L))
          .as("sampled_chars"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))
  }

  /** Exact per-stratum quota sampling: EXACTLY min(10, n) docs per
    * language, chosen by a deterministic pseudo-random hash order
    * (different md5 bits than q60/q121 so the samples decorrelate).
    * Unlike threshold sampling the quota is hit exactly — the eval-set
    * builder's contract. The window partitions by stratum, so
    * parallelism grows with stratum count; no global sort.
    */
  val quotaSample = Q(
    "q122_quota_sample",
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 7))::BIGINT AS hv
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS INTEGER) AS rk
      |  FROM h)
      |SELECT doc_id, lang, rk FROM r WHERE rk <= 10
      |ORDER BY lang, rk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("hv"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 9, 7), 16, 10) AS BIGINT)").as("hv"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  val specs: Seq[Q] = Seq(balancedSample, weightedSample, quotaSample)
}
