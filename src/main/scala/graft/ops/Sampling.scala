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

  val specs: Seq[Q] = Seq(balancedSample)
}
