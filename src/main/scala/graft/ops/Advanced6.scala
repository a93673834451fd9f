package graft.ops

import graft.{Det, Q, Tables}
import graft.functions.BloomFilters
import org.apache.spark.sql.functions._

/** Sixth advanced batch (round 3): relational unpivot (wide→long melt),
  * bloom-prefiltered incremental dedup, and weighted source mixing.
  *
  * Scale notes: q89 is one partial-agg'd scan plus a rowcount×3 generate;
  * q90 broadcasts a bloom filter of corpus fingerprints so the exact
  * anti-join probes only the bloom-positive sliver (for a 10⁹-doc corpus
  * at 1% fpp that is ~1% of the arriving batch instead of all of it);
  * q91 is a narrow projection + partial-agg'd groupBy — one scan.
  */
object Advanced6 {

  /** Wide→long melt of per-segment price stats via `unpivot` — the
    * reshape feeding chart/export layers. The aggregate is the expensive
    * part (one scan, map-side combine); the melt triples 5 rows.
    */
  val unpivotStats = Q(
    "q89_unpivot",
    """WITH w AS (
      |  SELECT c_mktsegment,
      |    ROUND(MIN(o_totalprice), 2) AS min_price,
      |    ROUND(MAX(o_totalprice), 2) AS max_price,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment)
      |SELECT c_mktsegment, stat, v FROM (
      |  SELECT c_mktsegment, 'min_price' AS stat, min_price AS v FROM w
      |  UNION ALL
      |  SELECT c_mktsegment, 'max_price' AS stat, max_price AS v FROM w
      |  UNION ALL
      |  SELECT c_mktsegment, 'sum_price' AS stat, sum_price AS v FROM w)
      |ORDER BY c_mktsegment, stat""".stripMargin) { (s, d) =>
    val wide = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        Det.dsum(col("o_totalprice")).as("sum_price"))
    wide.unpivot(
        Array(col("c_mktsegment")),
        Array(col("min_price"), col("max_price"), col("sum_price")),
        "stat", "v")
      .orderBy(col("c_mktsegment"), col("stat"))
  }

  /** Bloom-prefiltered incremental dedup (q65's scale path made real):
    * arriving docs (doc_id ≥ 400) are admitted only if their 4-token
    * prefix fingerprint is absent from the existing corpus (doc_id <
    * 400). The bloom filter short-circuits the definitely-new majority
    * WITHOUT touching the corpus; only bloom-positives reach the exact
    * anti-join. Bloom filters have no false negatives, so
    * prefilter + exact-verify ≡ plain anti-join — the oracle IS the
    * plain anti-join, and the equivalence is what the driver checks.
    */
  val bloomPrefilter = Q(
    "q90_bloom_prefilter",
    """WITH d AS (
      |  SELECT doc_id, source,
      |    array_to_string(string_split(text, ' ')[1:4], ' ') AS fp
      |  FROM documents)
      |SELECT b.doc_id, b.source FROM d b
      |WHERE b.doc_id >= 400 AND NOT EXISTS (
      |  SELECT 1 FROM d c WHERE c.doc_id < 400 AND c.fp = b.fp)
      |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("fp"))
    val corpus = docs.filter(col("doc_id") < 400).select(col("fp")).distinct()
    val batch = docs.filter(col("doc_id") >= 400)
    // Sized from the corpus count: a production pipeline carries this in
    // metadata rather than re-counting (one columnar scan here).
    val bloom = BloomFilters.build(corpus, col("fp"),
      expectedItems = math.max(1000L, corpus.count()), fpp = 0.03)
    val flagged = batch.withColumn("maybe", BloomFilters.mightContain(bloom, col("fp")))
    val definitelyNew = flagged.filter(!col("maybe"))
    val verifiedNew = flagged.filter(col("maybe"))
      .join(corpus, Seq("fp"), "left_anti")
    definitelyNew.select(col("doc_id"), col("source"))
      .union(verifiedNew.select(col("doc_id"), col("source")))
      .orderBy(col("doc_id"))
  }

  /** Weighted source mixing — the data-mixture step of training-corpus
    * assembly: each source keeps a configured fraction, selected by a
    * content-independent per-doc hash so the mixture is reproducible
    * under any partitioning. Uses md5 chars 9-15 while q87's split uses
    * chars 1-7: mixture and split decisions stay independent (a doc's
    * survival says nothing about its split).
    */
  val sourceMixture = Q(
    "q91_source_mixture",
    """WITH r AS (
      |  SELECT source, n_chars,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 7))::BIGINT % 1000 AS b,
      |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1.0
      |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.5
      |         ELSE 0.25 END AS rate
      |  FROM documents)
      |SELECT source, CAST(rate AS DOUBLE) AS rate,
      |  COUNT(*) AS n_before,
      |  COUNT(*) FILTER (WHERE b < rate * 1000) AS n_after
      |FROM r GROUP BY source, rate
      |ORDER BY source""".stripMargin) { (s, d) =>
    val rate = when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 1.0)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 0.5)
      .otherwise(0.25)
    val bucket =
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 9, 7), 16, 10) AS BIGINT) % 1000")
    Tables.documents(s, d)
      .select(col("source"), rate.as("rate"), bucket.as("b"))
      .groupBy(col("source"), col("rate"))
      .agg(count(lit(1)).as("n_before"),
        count(when(col("b") < col("rate") * 1000, 1)).as("n_after"))
      .orderBy(col("source"))
  }

  def specs: Seq[Q] = Seq(unpivotStats, bloomPrefilter, sourceMixture)
}
