package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 continuation: the two per-source corpus-shaping decisions a
  * pretraining recipe makes after curation metrics are in.
  *
  *  - q185 SOURCE CAPS: bound every source's document count at a fixed
  *    cap by deterministic hash rank (the CommonCrawl-style per-domain
  *    cap that stops one crawl host from dominating a mixture). Rank is
  *    md5('cap:'||doc_id) within source — content-independent, stable
  *    under repartition and across reruns, and a NEW document never
  *    displaces a kept one until the cap binds (ranks only append).
  *    Scale shape: one window partitioned BY SOURCE over (source,
  *    doc_id, hash) metadata — no global sort, no shuffle wider than
  *    the source key space.
  *  - q186 EPOCH RECIPE: integer repeat factors per source (the LLaMA-
  *    style upsampling table) from an exact-ppm lexical-diversity
  *    weight: d_ppm = half-up(distinct_toks·10⁶ / toks); repeats = 1 +
  *    (d_ppm·3) // max_ppm ∈ [1, 4] (the most diverse source trains 4
  *    epochs, the least ≥1). Everything is integer algebra on a
  *    source-count-sized aggregate — both engines replay it exactly,
  *    and the output is the per-source effective-token share a mixture
  *    scheduler consumes.
  */
object Advanced19 {

  // ---------------------------------------------------------------- q185

  private val SourceCap = 20

  /** q185: keep at most [[SourceCap]] docs per source by md5 rank; emit
    * the per-source admission summary (kept/dropped and the hash-rank
    * cut the NEXT document must beat). The salted hash ('cap:' prefix)
    * is disjoint from every other hash-slice family in the registry.
    */
  val sourceCaps = Q(
    "q185_source_caps",
    s"""WITH h AS (
       |  SELECT source, doc_id,
       |    md5('cap:' || CAST(doc_id AS VARCHAR)) AS hk,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |r AS (
       |  SELECT source, doc_id, hk, n_toks,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS INTEGER) AS rnk,
       |    CAST(COUNT(*) OVER (PARTITION BY source) AS INTEGER) AS n_src
       |  FROM h)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rnk <= $SourceCap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN rnk > $SourceCap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN rnk <= $SourceCap THEN n_toks ELSE 0 END) AS BIGINT) AS kept_toks,
       |  MAX(CASE WHEN rnk = LEAST($SourceCap, n_src) THEN hk END) AS cut_hash
       |FROM r GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val h = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("hk"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    val r = h.withColumn("rnk", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy(col("source"))))
    r.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rnk") <= SourceCap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rnk") > SourceCap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rnk") <= SourceCap, col("n_toks")).otherwise(0L)).as("kept_toks"),
        max(when(col("rnk") === least(lit(SourceCap), col("n_src").cast("int")),
          col("hk"))).as("cut_hash"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q186

  private val MaxEpochs = 4

  /** q186: the per-source epoch/upsampling recipe — see object doc. The
    * diversity weight reuses q182's distinct-unigram signal in q154's
    * exact half-up ppm integers, so the whole recipe is integer algebra.
    */
  val epochRecipe = Q(
    "q186_epoch_recipe",
    s"""WITH t AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
       |s AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_toks,
       |    CAST(COUNT(DISTINCT tok) AS BIGINT) AS d_toks
       |  FROM t GROUP BY source),
       |w AS (
       |  SELECT source, n_toks,
       |    CAST((2 * d_toks * 1000000 + n_toks) // (2 * n_toks) AS BIGINT) AS d_ppm
       |  FROM s),
       |m AS (SELECT MAX(d_ppm) AS max_ppm FROM w),
       |rec AS (
       |  SELECT source, n_toks, d_ppm,
       |    CAST(1 + (d_ppm * ${MaxEpochs - 1}) // max_ppm AS INTEGER) AS repeats
       |  FROM w CROSS JOIN m)
       |SELECT source, n_toks, d_ppm, repeats,
       |  CAST(n_toks * repeats AS BIGINT) AS eff_toks,
       |  CAST((2 * n_toks * repeats * 1000000 +
       |    (SELECT SUM(n_toks * repeats) FROM rec)) //
       |    (2 * (SELECT SUM(n_toks * repeats) FROM rec)) AS BIGINT) AS share_ppm
       |FROM rec ORDER BY source""".stripMargin) { (s, d) =>
    val agg = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_toks"), countDistinct(col("tok")).as("d_toks"))
      .select(col("source"), col("n_toks"),
        Det.halfUpDiv(col("d_toks") * 1000000L, col("n_toks")).as("d_ppm"))
    val m = agg.agg(max(col("d_ppm")).as("max_ppm"))
    val rec = agg.crossJoin(broadcast(m))
      .select(col("source"), col("n_toks"), col("d_ppm"),
        (lit(1) + expr(s"(d_ppm * ${MaxEpochs - 1}) div max_ppm")).cast("int")
          .as("repeats"))
      .withColumn("eff_toks", col("n_toks") * col("repeats"))
    val tot = rec.agg(sum(col("eff_toks")).as("tot_eff"))
    rec.crossJoin(broadcast(tot))
      .select(col("source"), col("n_toks"), col("d_ppm"), col("repeats"),
        col("eff_toks"),
        Det.halfUpDiv(col("eff_toks") * 1000000L, col("tot_eff")).as("share_ppm"))
      .orderBy(col("source"))
  }

  val specs: Seq[Q] = Seq(sourceCaps, epochRecipe)
}
