package graft.ops

import graft.{Q, Tables}
import graft.functions.{Deletions2, NGrams}
import org.apache.spark.sql.functions._

/** Sixth advanced batch (round 4): the depth-2 entity-resolution join,
  * the sketch-based path for cross-source overlap, and two
  * feature-engineering closers whose naive float forms are not
  * oracle-stable — EWMA recency weighting (exact bounded-depth decimal
  * decay) and MAD robust outliers (exact integer-cents medians).
  */
object Advanced10 {

  /** Fuzzy join at Levenshtein distance ≤ 2 via depth-2 symmetric-
    * delete blocking (`graft_deletions2`): every unit edit costs at
    * most one deletion on each side, so depth-2 neighborhoods
    * intersect for EVERY distance-≤2 pair — the equi-join on exploded
    * keys is exact blocking, and the levenshtein verify touches only
    * blocked candidates. Key fan-out is 1 + len + len·(len−1)/2 per
    * string (the O(len²) knob q110 documents); probes are corrupted by
    * TWO character drops so genuine distance-2 matches exist. The
    * oracle's bounded cross join proves the blocking loses nothing.
    */
  val fuzzyJoin2 = Q(
    "q124_fuzzy_join2",
    """WITH probes AS (
      |  SELECT DISTINCT substr(c_name, 1, 1) || substr(c_name, 3, 2)
      |    || substr(c_name, 6, 1000) AS probe
      |  FROM customer WHERE c_custkey % 199 = 0)
      |SELECT p.probe, c.c_custkey, c.c_name,
      |  CAST(levenshtein(c.c_name, p.probe) AS INTEGER) AS dist
      |FROM customer c CROSS JOIN probes p
      |WHERE levenshtein(c.c_name, p.probe) <= 2
      |ORDER BY probe, c_custkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
    // drop the 2nd and 5th characters -> distance exactly 2 from the source
    val probes = cust.filter(pmod(col("c_custkey"), lit(199)) === 0)
      .select(concat(substring(col("c_name"), 1, 1), substring(col("c_name"), 3, 2),
        substring(col("c_name"), 6, 1000)).as("probe"))
      .distinct()
    val custKeys = cust.select(col("c_custkey"), col("c_name"),
      explode(Deletions2.deletions2(col("c_name"))).as("k"))
    val probeKeys = probes.select(col("probe"),
      explode(Deletions2.deletions2(col("probe"))).as("k"))
    custKeys.join(probeKeys, Seq("k"))
      .select(col("probe"), col("c_custkey"), col("c_name"))
      .distinct() // a pair collides on many deletion keys
      .filter(levenshtein(col("c_name"), col("probe")) <= 2)
      .select(col("probe"), col("c_custkey"), col("c_name"),
        levenshtein(col("c_name"), col("probe")).cast("int").as("dist"))
      .orderBy(col("probe"), col("c_custkey"))
  }

  /** Sketch-based cross-source overlap — the 100 TB path for q103's
    * contamination matrix: ONE HLL sketch per source (KB-sized,
    * mergeable, built with map-side partial aggregation over the gram
    * stream) replaces the distinct-vocabulary self-join entirely;
    * pairwise overlap comes from inclusion–exclusion on sketch unions
    * of the broadcast 20-row sketch table. Estimates are DataSketches
    * HLL (deterministic for a given input set, but engine-specific), so
    * the oracle-checkable form outputs the EXACT per-source and shared
    * gram counts plus booleans asserting each estimate sits within its
    * error bound (per-set: 8% ≈ 5σ at the default lgK=12 sketch's ~1.6%
    * rsd; shared via inclusion–exclusion: the sum of the three
    * constituent sketch errors, bounded by 12% of n_a+n_b plus a
    * small-count floor). The bounds carry ~5σ headroom because a harness
    * testdata regeneration resamples the input set and rsd is a standard
    * deviation, not a guarantee (round-8 advice) — a lone flip of one of
    * these booleans after a regeneration indicts the bound, not the
    * plan. The exact twin here is oracle-scale verification only — at
    * 100 TB the sketch path IS the product and the exact columns come
    * from q103's batch matrix when needed.
    */
  val sourceOverlapSketch = Q(
    "q125_source_overlap_sketch",
    """WITH t AS (
      |  SELECT source, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |r AS (
      |  SELECT source, unnest(list_transform(range(1, len(toks) - 1),
      |    i -> array_to_string(toks[i:i+2], ' '))) AS gr
      |  FROM t),
      |g AS (SELECT DISTINCT source, gr FROM r),
      |sz AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
      |ov AS (
      |  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      |  FROM g a JOIN g b ON a.gr = b.gr AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT sa.source AS src_a, sb.source AS src_b,
      |  sa.n AS n_a, sb.n AS n_b,
      |  COALESCE(ov.n_shared, 0) AS n_shared,
      |  TRUE AS a_ok, TRUE AS b_ok, TRUE AS shared_ok
      |FROM sz sa JOIN sz sb ON sa.source < sb.source
      |LEFT JOIN ov ON ov.src_a = sa.source AND ov.src_b = sb.source
      |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    // One distinct per-source vocabulary pass feeds BOTH sides: the HLL
    // sketches (the scale path under check) and the exact counts (the
    // in-query oracle twin). Checkpointed so the subtree plans once.
    val g = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(NGrams.ngrams(col("toks"), 3)).as("gr"))
      .distinct()
      .localCheckpoint()
    val sk = g.groupBy(col("source"))
      .agg(hll_sketch_agg(xxhash64(col("gr"))).as("sk"),
        count(lit(1)).as("n"),
        hll_sketch_estimate(hll_sketch_agg(xxhash64(col("gr")))).as("est_n"))
    val ov = g.as("a")
      .join(g.as("b"), col("a.gr") === col("b.gr") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("o_a"), col("b.source").as("o_b"))
      .agg(count(lit(1)).as("n_shared_raw"))
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .join(ov,
        col("a.source") === col("o_a") && col("b.source") === col("o_b"), "left")
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        coalesce(col("n_shared_raw"), lit(0L)).as("n_shared"),
        col("a.est_n").as("est_a"), col("b.est_n").as("est_b"),
        (col("a.est_n") + col("b.est_n")
          - hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk"))))
          .as("est_shared"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_shared"),
        (abs(col("est_a") - col("n_a")) <= col("n_a") * 0.08).as("a_ok"),
        (abs(col("est_b") - col("n_b")) <= col("n_b") * 0.08).as("b_ok"),
        (abs(col("est_shared") - col("n_shared"))
          <= (col("n_a") + col("n_b")) * 0.12 + 24).as("shared_ok"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Recency-weighted engagement (EWMA over each user's last 8 events,
    * decay 0.9) — the classic feature-engineering op whose naive form
    * (`pow(0.9, k)` per engine) is NOT bit-stable across engines.
    * Bounded depth makes it exact: 0.9^k for k ≤ 7 is an exact decimal
    * (9^k·10^(7-k) in 10^-7 units), so every term is INTEGER arithmetic
    * and the sum is order-independent. The window partitions by user —
    * parallelism grows with user cardinality; the k < 8 filter caps
    * per-user state like a streaming last-N buffer would.
    */
  val ewmaEngagement = Q(
    "q126_ewma_engagement",
    """WITH r AS (
      |  SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) - 1 AS k
      |  FROM events),
      |t AS (
      |  SELECT user_id,
      |    CASE k WHEN 0 THEN cents * 10000000
      |           WHEN 1 THEN cents * 9000000
      |           WHEN 2 THEN cents * 8100000
      |           WHEN 3 THEN cents * 7290000
      |           WHEN 4 THEN cents * 6561000
      |           WHEN 5 THEN cents * 5904900
      |           WHEN 6 THEN cents * 5314410
      |           WHEN 7 THEN cents * 4782969 END AS term
      |  FROM r WHERE k < 8)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_recent,
      |  CAST(SUM(term) AS BIGINT) AS ewma_scaled,
      |  CAST(SUM(term) AS BIGINT) / 1000000000.0 AS ewma
      |FROM t
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // Order by MICROsecond ts like every other event window (ts_us):
    // Both engines order on epoch-MICROS (Tables.tsUs / epoch_ns//1000):
    // ordering on the raw ts column could silently diverge for
    // same-microsecond events when the testdata is NANOS-typed.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val decay = Seq(10000000L, 9000000L, 8100000L, 7290000L,
      6561000L, 5904900L, 5314410L, 4782969L) // 0.9^k in 1e-7 units
    val ev = Tables.events(s, d)
    val r = ev
      .select(col("user_id"), col("event_id"), Tables.tsUs(ev).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("k", row_number().over(w) - 1)
      .filter(col("k") < 8)
    val term = decay.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (mult, k)) => when(col("k") === k, col("cents") * mult).otherwise(acc)
    }
    r.select(col("user_id"), term.as("term"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_recent"), sum(col("term")).as("ewma_scaled"))
      .select(col("user_id"), col("n_recent"), col("ewma_scaled"),
        (col("ewma_scaled") / 1000000000.0).as("ewma"))
      .orderBy(col("user_id"))
  }

  /** Robust outlier detection per event type: median + MAD over integer
    * cents, flagging |v − med| > 3·MAD. Working in cents keeps every
    * derived quantity (medians interpolate to halves, deviations to
    * halves, MADs to quarters) EXACTLY representable, so the threshold
    * comparison has no cross-engine float boundary at all — the same
    * reason q105's winsorize works. Exact per-group percentiles are the
    * bounded-cardinality path (5 event types); the 100 TB
    * high-cardinality path is approx_percentile (q51b's t-digest),
    * same plan otherwise.
    */
  val madOutliers = Q(
    "q127_mad_outliers",
    """WITH e AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
      |m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM e GROUP BY event_type),
      |j AS (SELECT e.event_type, e.cents, m.med, ABS(e.cents - m.med) AS dev
      |      FROM e JOIN m USING (event_type)),
      |m2 AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM j GROUP BY event_type)
      |SELECT j.event_type,
      |  ROUND(MAX(j.med) / 100.0, 4) AS median_value,
      |  ROUND(MAX(m2.mad) / 100.0, 4) AS mad_value,
      |  CAST(COUNT(CASE WHEN j.dev > 3 * m2.mad THEN 1 END) AS BIGINT) AS n_outliers,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM j JOIN m2 USING (event_type)
      |GROUP BY j.event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val m = e.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val j = e.join(m, Seq("event_type"))
      .withColumn("dev", abs(col("cents") - col("med")))
    val m2 = j.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    j.join(m2, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        round(max(col("med")) / 100.0, 4).as("median_value"),
        round(max(col("mad")) / 100.0, 4).as("mad_value"),
        count(when(col("dev") > lit(3.0) * col("mad"), 1)).as("n_outliers"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** The first BPE training iteration: count adjacent CHARACTER pairs
    * inside tokens (never across token boundaries) and rank merge
    * candidates — the map-reduce core a distributed tokenizer trainer
    * repeats per merge. The pair stream generates inside whole-stage
    * codegen (Generate over a sequence + substr — no interpreted
    * lambda), partial-aggs map-side, and shuffles only (pair, count)
    * vocabulary rows. Each merge round at 100 TB is exactly this plan
    * re-run on the re-paired corpus.
    */
  val bpeMergePairs = Q(
    "q128_bpe_merge_pairs",
    """WITH t AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |p AS (
      |  SELECT unnest(list_transform(range(1, len(tok)),
      |    i -> substr(tok, CAST(i AS INTEGER), 2))) AS pair
      |  FROM t WHERE len(tok) >= 2)
      |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
      |FROM p
      |GROUP BY pair
      |ORDER BY n DESC, pair
      |LIMIT 20""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(col("tok"), explode(expr("sequence(1, length(tok) - 1)")).as("i"))
      .select(expr("substr(tok, i, 2)").as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  /** Inverted-index construction: per token, document frequency plus
    * the first 10 postings (sorted doc ids) for the 20 highest-df
    * tokens — the search-index build step. Postings cap via a
    * per-token rank window BEFORE aggregation (bounded state per
    * token); df counts the UNCAPPED distinct docs. Output postings are
    * a CSV string, not an array (the driver's comparator is
    * scalar-columns-only, q72's ordered-agg recipe).
    */
  val invertedIndex = Q(
    "q129_inverted_index",
    """WITH t AS (
      |  SELECT DISTINCT tok, doc_id FROM (
      |    SELECT unnest(string_split(text, ' ')) AS tok, doc_id FROM documents) z),
      |d AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY tok),
      |r AS (
      |  SELECT tok, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY tok ORDER BY doc_id) AS rk
      |  FROM t),
      |p AS (
      |  SELECT tok, string_agg(doc_id, ',' ORDER BY doc_id) AS postings
      |  FROM r WHERE rk <= 10 GROUP BY tok)
      |SELECT d.tok, d.df, p.postings
      |FROM d JOIN p USING (tok)
      |ORDER BY df DESC, tok
      |LIMIT 20""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"), col("doc_id"))
      .distinct()
    val dfr = t.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val capped = t
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("tok")).orderBy(col("doc_id"))))
      .filter(col("rk") <= 10)
      .groupBy(col("tok"))
      .agg(array_join(array_sort(collect_list(col("doc_id"))), ",").as("postings"))
    dfr.join(capped, Seq("tok"))
      .select(col("tok"), col("df"), col("postings"))
      .orderBy(col("df").desc, col("tok"))
      .limit(20)
  }

  val specs: Seq[Q] = Seq(fuzzyJoin2, sourceOverlapSketch, ewmaEngagement,
    madOutliers, bpeMergePairs, invertedIndex)
}
