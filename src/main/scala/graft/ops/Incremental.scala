package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Incremental-ingestion operators: the steady-state shape of a corpus
  * pipeline is "new batch arrives, dedup it against everything already
  * ingested" — an anti-join on content identity, not a full recompute.
  */
object Incremental {

  /** Dedup a new batch (doc_id >= 400 stands in for the arriving delta)
    * against the existing corpus (doc_id < 400) by exact content hash,
    * and report the batch's survival stats per language. At scale the
    * existing-corpus side is a bloom/hash index; the anti-join shape is
    * identical.
    */
  val incrementalDedup = Q(
    "q65_incremental_dedup",
    """WITH corpus AS (
      |  SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id < 400),
      |batch AS (
      |  SELECT doc_id, lang, md5(text) AS h FROM documents WHERE doc_id >= 400),
      |fresh AS (
      |  SELECT b.* FROM batch b WHERE NOT EXISTS
      |    (SELECT 1 FROM corpus c WHERE c.h = b.h))
      |SELECT lang,
      |  (SELECT COUNT(*) FROM batch b2 WHERE b2.lang = f.lang) AS n_batch,
      |  COUNT(*) AS n_fresh
      |FROM fresh f
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).withColumn("h", md5(col("text")))
    val corpus = docs.filter(col("doc_id") < 400).select(col("h")).distinct()
    val batch = docs.filter(col("doc_id") >= 400).select(col("doc_id"), col("lang"), col("h"))
    val fresh = batch.join(corpus, Seq("h"), "left_anti")
    val batchCounts = batch.groupBy(col("lang")).agg(count(lit(1)).as("n_batch"))
    fresh.groupBy(col("lang")).agg(count(lit(1)).as("n_fresh"))
      .join(broadcast(batchCounts), Seq("lang"))
      .select(col("lang"), col("n_batch"), col("n_fresh"))
      .orderBy(col("lang"))
  }

  /** Key-skew profile: per-key cardinality statistics for a join/groupBy
    * key — the diagnostic that decides whether salting/AQE skew handling
    * is needed BEFORE a job burns a day on one straggler partition.
    */
  val skewProfile = Q(
    "q66_skew_profile",
    """WITH per_key AS (
      |  SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey)
      |SELECT
      |  COUNT(*) AS n_keys,
      |  CAST(MIN(n) AS BIGINT) AS min_per_key,
      |  CAST(MAX(n) AS BIGINT) AS max_per_key,
      |  (2 * SUM(n) * 10000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0 AS avg_per_key,
      |  (2 * MAX(n) * COUNT(*) * 10000 + SUM(n)) // (2 * SUM(n)) / 10000.0 AS skew_ratio
      |FROM per_key""".stripMargin) { (s, d) =>
    val perKey = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    perKey.agg(
      count(lit(1)).as("n_keys"),
      min(col("n")).as("min_per_key"),
      max(col("n")).as("max_per_key"),
      sum(col("n")).as("sum_n"))
      .select(col("n_keys"), col("min_per_key"), col("max_per_key"),
        (Det.halfUpDiv(col("sum_n") * 10000, col("n_keys")) / 10000.0)
          .as("avg_per_key"),
        // skew = max/avg = max*n_keys/sum, rounded the same exact way
        (Det.halfUpDiv(col("max_per_key") * col("n_keys") * 10000, col("sum_n")) / 10000.0)
          .as("skew_ratio"))
  }

  val specs: Seq[Q] = Seq(incrementalDedup, skewProfile)
}
