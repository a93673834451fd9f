package graft.ops

import graft.{Det, Q, Tables}
import graft.functions.NGrams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Third advanced batch (round 2): the candidate→verify dedup stage,
  * boilerplate detection, grouping sets, ordered string aggregation,
  * EXISTS/scalar subqueries, rank-family windows, embedding centroids,
  * and the end-to-end corpus purge.
  *
  * Scale notes: q69 confines exact-Jaccard verification to the LSH
  * candidate pairs (O(candidates), never O(n²)); q70/q75 are narrow
  * projections / partial-agg shapes; q76 reuses the shared cluster
  * labels (computed once per session with q57).
  */
object Advanced3 {

  /** Candidate→verify: exact 3-gram Jaccard over ONLY the LSH candidate
    * pairs — the verification stage that follows q32's recall stage in a
    * production dedup pipeline. MinHash estimates (q32) have variance;
    * the final drop decision wants the true Jaccard, and computing it
    * here costs O(candidate pairs), not O(n²).
    */
  val lshVerify = Q(
    "q69_lsh_verify",
    (TextOps.lshOracleSql() +
      """,
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM bcap a JOIN bcap b
      |    ON a.b = b.b AND a.s1 = b.s1 AND a.s2 = b.s2 AND a.doc_id < b.doc_id),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM hs GROUP BY doc_id),
      |inter AS (
      |  SELECT c.da, c.db, COUNT(*) AS n_common
      |  FROM cand c JOIN hs sa ON sa.doc_id = c.da
      |              JOIN hs sb ON sb.doc_id = c.db AND sb.s = sa.s
      |  GROUP BY c.da, c.db),
      |pairs AS (
      |  SELECT c.da, c.db, COALESCE(i.n_common, 0) AS n_common
      |  FROM cand c LEFT JOIN inter i ON i.da = c.da AND i.db = c.db)
      |SELECT p.da, p.db, p.n_common,
      |  ROUND(p.n_common * 1.0 / (sa.n + sb.n - p.n_common), 6) AS jaccard,
      |  CASE WHEN p.n_common * 1.0 / (sa.n + sb.n - p.n_common) >= 0.8
      |       THEN 'dup' ELSE 'candidate' END AS verdict
      |FROM pairs p
      |JOIN sizes sa ON sa.doc_id = p.da
      |JOIN sizes sb ON sb.doc_id = p.db
      |ORDER BY da, db""").stripMargin) { (s, d) =>
    candidatePairStats(s, d)
      .withColumn("jac_raw",
        col("n_common") * 1.0 / (col("na") + col("nb") - col("n_common")))
      .select(col("da"), col("db"), col("n_common"),
        round(col("jac_raw"), 6).as("jaccard"),
        when(col("jac_raw") >= 0.8, "dup").otherwise("candidate").as("verdict"))
      .orderBy(col("da"), col("db"))
  }

  /** Shared verify-stage base: for every LSH candidate pair, the exact
    * distinct-3-gram overlap `(da, db, n_common, na, nb)`. Cost is
    * O(candidate pairs), never O(n²) — the gram join touches only docs
    * that appear in a candidate pair. q69 derives Jaccard from it;
    * q119 derives the asymmetric containment ratios.
    */
  private[ops] def candidatePairStats(s: SparkSession, d: String): DataFrame = {
    val cand = TextOps.minhashCandidates(s, d)
    val sh = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(NGrams.ngrams(col("toks"), 3))).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("sa"), col("da") === col("sa.doc_id"))
      .join(sh.as("sb"), col("db") === col("sb.doc_id") && col("sb.s") === col("sa.s"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_common_i"))
    val pairs = cand.join(inter, Seq("da", "db"), "left")
      .select(col("da"), col("db"), coalesce(col("n_common_i"), lit(0L)).as("n_common"))
    pairs
      .join(sizes.as("za"), col("da") === col("za.doc_id"))
      .join(sizes.as("zb"), col("db") === col("zb.doc_id"))
      .select(col("da"), col("db"), col("n_common"),
        col("za.n").as("na"), col("zb.n").as("nb"))
  }

  /** Boilerplate detection: repeated-bigram ratio per document (the
    * Gopher-style repetition quality signal) — one narrow projection, no
    * shuffle, embarrassingly parallel at any scale.
    */
  val boilerplate = Q(
    "q70_boilerplate",
    """WITH f AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |b AS (
      |  SELECT doc_id, lang,
      |    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
      |  FROM f)
      |SELECT doc_id, lang,
      |  CAST(len(bg) AS INTEGER) AS n_bigrams,
      |  CAST(len(list_distinct(bg)) AS INTEGER) AS n_distinct,
      |  ROUND((len(bg) - len(list_distinct(bg))) * 1.0 / len(bg), 6) AS dup_ratio,
      |  CASE WHEN (len(bg) - len(list_distinct(bg))) * 1.0 / len(bg) >= 0.5 THEN 'boiler'
      |       WHEN (len(bg) - len(list_distinct(bg))) * 1.0 / len(bg) >= 0.2 THEN 'mixed'
      |       ELSE 'clean' END AS band
      |FROM b
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val f = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .withColumn("bg", NGrams.ngrams(col("toks"), 2))
      .select(col("doc_id"), col("lang"),
        size(col("bg")).as("n_bigrams"),
        size(array_distinct(col("bg"))).as("n_distinct"))
    f.withColumn("ratio_raw",
        (col("n_bigrams") - col("n_distinct")) * 1.0 / col("n_bigrams"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("n_distinct"),
        round(col("ratio_raw"), 6).as("dup_ratio"),
        when(col("ratio_raw") >= 0.5, "boiler")
          .when(col("ratio_raw") >= 0.2, "mixed")
          .otherwise("clean").as("band"))
      .orderBy(col("doc_id"))
  }

  /** GROUPING SETS — independent subtotal lattices in one pass (beyond
    * q25's rollup / q46's cube): by status, by priority, and the grand
    * total. gid is derived from key NULL-ness in both engines, avoiding
    * any engine-specific grouping_id bit order.
    */
  val groupingSets = Q(
    "q71_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  (CASE WHEN o_orderstatus IS NULL THEN 2 ELSE 0 END
      |   + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS gid,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("total_value"))
      .withColumn("gid",
        when(col("o_orderstatus").isNull, 2).otherwise(0)
          + when(col("o_orderpriority").isNull, 1).otherwise(0))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n_orders"), col("total_value"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_last,
        col("o_orderpriority").asc_nulls_last)
  }

  /** Ordered string aggregation (LISTAGG): nations per region as a
    * deterministic csv — collect_list is unordered across partitions, so
    * the engine sorts the collected array before joining.
    */
  val stringAgg = Q(
    "q72_string_agg",
    """SELECT r_name,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
      |  COUNT(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations_csv"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))
  }

  /** EXISTS / NOT EXISTS / scalar subquery, DataFrame-style: semi-join,
    * anti-join, and a broadcast 1-row aggregate. The rich-customer
    * threshold compares c_acctbal * n_customers > sum(acctbal) — exact
    * decimal arithmetic on both engines, no float-division boundary.
    */
  val subqueries = Q(
    "q73_subqueries",
    """WITH g AS (
      |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
      |         COUNT(*) AS n_cust
      |  FROM customer),
      |f AS (
      |  SELECT c_custkey, c_nationkey,
      |    (CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT n_cust FROM g) > (SELECT bal_sum FROM g)
      |     AND EXISTS (SELECT 1 FROM orders
      |                 WHERE o_custkey = c_custkey AND o_totalprice > 200000)) AS rich,
      |    NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS inactive
      |  FROM customer)
      |SELECT n_name,
      |  CAST(SUM(CASE WHEN rich THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
      |  CAST(SUM(CASE WHEN inactive THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive,
      |  COUNT(*) AS n_customers
      |FROM f JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
    val g = broadcast(cust.agg(
      sum(col("bal")).as("bal_sum"), count(lit(1)).as("n_cust")))
    val bigOrders = Tables.orders(s, d)
      .filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    val anyOrders = Tables.orders(s, d).select(col("o_custkey"))
    val richKeys = cust.crossJoin(g)
      .filter(col("bal") * col("n_cust") > col("bal_sum"))
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey")).withColumn("rich", lit(1L))
    val inactiveKeys = cust
      .join(anyOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey")).withColumn("inactive", lit(1L))
    cust
      .join(richKeys, Seq("c_custkey"), "left")
      .join(inactiveKeys, Seq("c_custkey"), "left")
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(coalesce(col("rich"), lit(0L))).as("n_rich"),
        sum(coalesce(col("inactive"), lit(0L))).as("n_inactive"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** Rank-family window functions (dense_rank / percent_rank /
    * cume_dist) — value-based, so tie handling is deterministic without
    * an artificial unique-key tiebreak.
    */
  val windowRanks = Q(
    "q74_window_ranks",
    """SELECT n_name, s_name, s_acctbal, d_rank, p_rank, c_dist FROM (
      |  SELECT n_name, s_name, s_acctbal,
      |    CAST(DENSE_RANK() OVER w AS INTEGER) AS d_rank,
      |    ROUND(PERCENT_RANK() OVER w, 6) AS p_rank,
      |    ROUND(CUME_DIST() OVER w, 6) AS c_dist
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal DESC)) t
      |WHERE d_rank <= 3
      |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("n_name")).orderBy(col("s_acctbal").desc)
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("s_name"), col("s_acctbal"))
      .withColumn("d_rank", dense_rank().over(w))
      .withColumn("p_rank", round(percent_rank().over(w), 6))
      .withColumn("c_dist", round(cume_dist().over(w), 6))
      .filter(col("d_rank") <= 3)
      .orderBy(col("n_name"), col("s_acctbal").desc, col("s_name"))
  }

  /** Per-label embedding centroids in long format (label, pos, value) —
    * the k-means/IVF training step: posexplode to (label, dim) cells,
    * partial-aggregated mean per cell. One shuffle of 64 cells per label
    * regardless of corpus size.
    */
  val embeddingCentroids = Q(
    "q75_embedding_centroids",
    """SELECT label, CAST(p.pos AS INTEGER) AS pos,
      |  (2 * SUM(CAST(ROUND(CAST(embedding[p.pos + 1] AS DOUBLE) * 1000000) AS BIGINT))
      |     + CASE WHEN SUM(CAST(ROUND(CAST(embedding[p.pos + 1] AS DOUBLE) * 1000000) AS BIGINT)) < 0
      |            THEN -COUNT(*) ELSE COUNT(*) END)
      |    // (2 * COUNT(*)) / 1000000.0 AS centroid_v,
      |  COUNT(*) AS n_vectors
      |FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS pos) p
      |GROUP BY label, p.pos
      |ORDER BY label, pos""".stripMargin) { (s, d) =>
    // Mean at 6 decimals in INTEGER micro-units (exact sum, half-up via
    // (2a+b) DIV 2b — both engines truncate identically): a double
    // division + round() flips between engines when the true mean sits
    // on a .0000005 boundary, which sf0.1 actually hits.
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(
        sum(round(col("v").cast("double") * 1000000).cast("long")).as("sum_micro"),
        count(lit(1)).as("n_vectors"))
      .select(col("label"), col("pos"),
        (Det.halfUpDiv(col("sum_micro"), col("n_vectors")) / 1000000.0)
          .as("centroid_v"),
        col("n_vectors"))
      .orderBy(col("label"), col("pos"))
  }

  /** End-to-end corpus purge: resolve near-dup clusters (shared labels
    * from q57's connected components) and report kept/dropped per
    * language — the final step that actually shrinks the corpus.
    */
  val corpusPurge = Q(
    "q76_corpus_purge",
    (TextOps.ccOracleSql +
      """,
      |reps AS (SELECT node AS doc_id, cluster AS cluster_rep FROM cl)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN r.cluster_rep IS NOT NULL AND r.cluster_rep <> d.doc_id
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(SUM(CASE WHEN r.cluster_rep IS NULL OR r.cluster_rep = d.doc_id
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM documents d LEFT JOIN reps r ON r.doc_id = d.doc_id
      |GROUP BY d.lang
      |ORDER BY lang""").stripMargin) { (s, d) =>
    val labels = DedupClusters.clusterLabels(s, d)
      .select(col("node").as("doc_id"), col("label").as("cluster_rep"))
    Tables.documents(s, d).as("d")
      .join(labels.as("r"), col("d.doc_id") === col("r.doc_id"), "left")
      .groupBy(col("d.lang").as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cluster_rep").isNotNull && col("cluster_rep") =!= col("d.doc_id"), 1L)
          .otherwise(0L)).as("n_dropped"),
        sum(when(col("cluster_rep").isNull || col("cluster_rep") === col("d.doc_id"), 1L)
          .otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  val specs: Seq[Q] = Seq(lshVerify, boilerplate, groupingSets, stringAgg,
    subqueries, windowRanks, embeddingCentroids, corpusPurge)
}
