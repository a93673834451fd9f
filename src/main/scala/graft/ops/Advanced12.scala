package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighth advanced batch (round 4): the training-run PLANNING ops — the
  * numbers a data-mixture owner computes before launching: how much of
  * each source fits a token budget (water-filling allocation), what a
  * batching strategy wastes on padding, and where each source's
  * adaptive quality bar sits. All exact integer arithmetic; nothing
  * corpus-pairwise.
  */
object Advanced12 {

  /** Token-budget allocation across sources — the data-mixture
    * water-filling problem: a budget of half the corpus' tokens, an
    * equal target share per source, and two allocation rounds: round 1
    * gives each source min(its tokens, budget/K); round 2 redistributes
    * the leftover equally across the sources that still have headroom.
    * (Production allocators iterate to fixpoint; two unrolled rounds
    * exhibit the saturation/redistribution mechanics that make uniform
    * rate × budget WRONG when sources are skewed.) Everything is
    * BIGINT division — bit-identical across engines — and the only
    * data-bearing aggregate is one per-source token count; the
    * allocation itself runs on the K-row source table.
    */
  val tokenBudget = Q(
    "q136_token_budget",
    """WITH s AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_toks) AS BIGINT) AS total,
      |               CAST(COUNT(*) AS BIGINT) AS k,
      |               CAST(SUM(n_toks) AS BIGINT) // 2 AS budget FROM s),
      |r1 AS (SELECT s.source, s.n_toks, tot.budget,
      |         LEAST(s.n_toks, tot.budget // tot.k) AS a1
      |       FROM s CROSS JOIN tot),
      |l1 AS (SELECT CAST(SUM(a1) AS BIGINT) AS spent,
      |         CAST(COUNT(*) FILTER (WHERE a1 < n_toks) AS BIGINT) AS unsat
      |       FROM r1),
      |r2 AS (SELECT r1.source, r1.n_toks,
      |         LEAST(r1.n_toks, r1.a1 + CASE WHEN r1.a1 < r1.n_toks
      |           THEN (r1.budget - l1.spent) // GREATEST(l1.unsat, 1) ELSE 0 END)
      |           AS allocated
      |       FROM r1 CROSS JOIN l1)
      |SELECT source, n_toks, allocated,
      |  (2 * allocated * 1000 + n_toks) // (2 * n_toks) / 1000.0 AS rate
      |FROM r2
      |ORDER BY source""".stripMargin) { (s, d) =>
    val src = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_toks"))
    val tot = src.agg(sum(col("n_toks")).as("total"), count(lit(1)).as("k"))
      .withColumn("budget", expr("total DIV 2"))
    val r1 = src.crossJoin(broadcast(tot))
      .withColumn("a1", least(col("n_toks"), expr("budget DIV k")))
    val l1 = r1.agg(sum(col("a1")).as("spent"),
      count(when(col("a1") < col("n_toks"), 1)).as("unsat"))
    r1.crossJoin(broadcast(l1))
      .withColumn("allocated", least(col("n_toks"),
        col("a1") + when(col("a1") < col("n_toks"),
          expr("(budget - spent) DIV GREATEST(unsat, 1L)")).otherwise(0L)))
      .select(col("source"), col("n_toks"), col("allocated"),
        (Det.halfUpDiv(col("allocated") * 1000, col("n_toks")) / 1000.0).as("rate"))
      .orderBy(col("source"))
  }

  /** Padding-waste report: what fixed-size batches of 8 docs pay in pad
    * tokens under doc_id-order batching versus length-sorted batching —
    * the measurement behind the length-bucketing trick every training
    * stack uses. Batches form per LANGUAGE (the window key is the
    * bucketing key — at corpus scale the same windows run per shard,
    * q68's packing layout); waste per batch is
    * `count·max(len) − sum(len)`. Exact integers end to end; ties in
    * the sorted order break on doc_id so both engines batch
    * identically. `saving` CAN be negative — sorted batching loses
    * when a heavy tail straddles the final partial batch — so the
    * oracle spells [[Det.halfUpDiv]]'s sign term (the Tables.scala
    * negative-capable rule).
    */
  val paddingWaste = Q(
    "q137_padding_waste",
    """WITH d AS (SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |nb AS (SELECT doc_id, lang, n_toks,
      |    (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) - 1) // 8 AS b
      |  FROM d),
      |sb AS (SELECT doc_id, lang, n_toks,
      |    (ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_toks, doc_id) - 1) // 8 AS b
      |  FROM d),
      |nw AS (SELECT lang, CAST(SUM(cnt * mx - sm) AS BIGINT) AS pad FROM (
      |    SELECT lang, b, COUNT(*) AS cnt, MAX(n_toks) AS mx,
      |      CAST(SUM(n_toks) AS BIGINT) AS sm FROM nb GROUP BY lang, b) q GROUP BY lang),
      |sw AS (SELECT lang, CAST(SUM(cnt * mx - sm) AS BIGINT) AS pad FROM (
      |    SELECT lang, b, COUNT(*) AS cnt, MAX(n_toks) AS mx,
      |      CAST(SUM(n_toks) AS BIGINT) AS sm FROM sb GROUP BY lang, b) q GROUP BY lang),
      |t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_toks) AS BIGINT) AS n_toks FROM d GROUP BY lang)
      |SELECT t.lang, t.n_docs, t.n_toks,
      |  nw.pad AS pad_naive, sw.pad AS pad_sorted,
      |  (2 * (nw.pad - sw.pad) * 1000
      |     + CASE WHEN nw.pad < sw.pad THEN -GREATEST(nw.pad, 1)
      |            ELSE GREATEST(nw.pad, 1) END)
      |    // (2 * GREATEST(nw.pad, 1)) / 1000.0 AS saving
      |FROM t JOIN nw USING (lang) JOIN sw USING (lang)
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    def waste(order: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame =
      docs.withColumn("rn",
          row_number().over(Window.partitionBy(col("lang")).orderBy(order: _*)))
        .withColumn("b", expr("CAST(rn - 1 AS BIGINT) DIV 8"))
        .groupBy(col("lang"), col("b"))
        .agg(count(lit(1)).as("cnt"), max(col("n_toks")).as("mx"),
          sum(col("n_toks")).as("sm"))
        .groupBy(col("lang"))
        .agg(sum(col("cnt") * col("mx") - col("sm")).as("pad"))
    val naive = waste(Seq(col("doc_id"))).withColumnRenamed("pad", "pad_naive")
    val sorted = waste(Seq(col("n_toks"), col("doc_id")))
      .withColumnRenamed("pad", "pad_sorted")
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"))
      .join(naive, Seq("lang")).join(sorted, Seq("lang"))
      .select(col("lang"), col("n_docs"), col("n_toks"),
        col("pad_naive"), col("pad_sorted"),
        (Det.halfUpDiv((col("pad_naive") - col("pad_sorted")) * 1000,
          greatest(col("pad_naive"), lit(1L))) / 1000.0).as("saving"))
      .orderBy(col("lang"))
  }

  /** Per-source adaptive quality gate: each source's own 10th-percentile
    * length is its bar (position-based — the value at sorted rank
    * ⌈n/10⌉, ties broken by doc_id, so NO interpolation and no float
    * percentile semantics to reconcile across engines); docs strictly
    * above the bar pass. This is the per-domain adaptive filter
    * (fixed global thresholds over-prune clean sources and under-prune
    * noisy ones). One rank window per source + a K-row broadcast of the
    * bars back to the stream.
    */
  val adaptiveQualityGate = Q(
    "q138_adaptive_quality_gate",
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |r AS (SELECT source, n_chars,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY source) AS n
      |      FROM d),
      |thr AS (SELECT source, n_chars AS threshold_chars FROM r
      |        WHERE rn = (n + 9) // 10)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  thr.threshold_chars,
      |  CAST(COUNT(*) FILTER (WHERE d.n_chars > thr.threshold_chars) AS BIGINT)
      |    AS n_kept,
      |  CAST(COUNT(*) FILTER (WHERE d.n_chars <= thr.threshold_chars) AS BIGINT)
      |    AS n_dropped
      |FROM d JOIN thr USING (source)
      |GROUP BY d.source, thr.threshold_chars
      |ORDER BY source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy(col("source"))
    val thr = docs
      .withColumn("rn", row_number().over(w.orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("rn") === expr("(n + 9) DIV 10"))
      .select(col("source"), col("n_chars").as("threshold_chars"))
    docs.join(broadcast(thr), Seq("source"))
      .groupBy(col("source"), col("threshold_chars"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("n_chars") > col("threshold_chars"), 1)).as("n_kept"),
        count(when(col("n_chars") <= col("threshold_chars"), 1)).as("n_dropped"))
      .select(col("source"), col("n_docs"), col("threshold_chars"),
        col("n_kept"), col("n_dropped"))
      .orderBy(col("source"))
  }

  /** ExactSubstr-style duplicated-span SCRUBBING (Lee et al. 2022's
    * "deduplicating training data" acted on, not just measured): every
    * token covered by a 5-gram span that also occurs in ANOTHER
    * document is cut from the text; the doc keeps its unique content.
    * q117 reports the dup-span fraction and q97/CorpusPipeline drop
    * whole docs — this is the third option a corpus team actually
    * ships, removing the boilerplate/quote while keeping the document.
    *
    * Scale shape: the duplicated-span vocabulary comes from the SHARED
    * q117/q134 span table (one corpus pass per session) and is
    * vocabulary-sized; positional grams join it on the hash, covered
    * positions explode from matched spans only, and the text rebuilds
    * per doc with array_sort(collect_list(struct(pos, tok))).tok — a
    * codegen'd struct-field extraction, no interpreted lambda. Never
    * doc×doc. Cross-doc spans only: a phrase repeated inside ONE doc
    * is that document's own style, not corpus duplication.
    */
  val exactSubstrScrub = Q(
    "q142_exact_substr_scrub",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |gi AS (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS i FROM d
      |       WHERE len(t) >= 5),
      |g AS (SELECT doc_id, i,
      |        ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))::BIGINT AS gh
      |      FROM gi),
      |dup AS (SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g) dg
      |        GROUP BY gh HAVING COUNT(*) >= 2),
      |cov AS (SELECT DISTINCT g.doc_id, i + k AS pos
      |        FROM g JOIN dup USING (gh), UNNEST(range(0, 5)) AS u(k)),
      |tp AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS pos FROM d),
      |toks AS (SELECT doc_id, pos, t[pos] AS tok FROM tp),
      |kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM toks tk
      |         LEFT JOIN cov c ON c.doc_id = tk.doc_id AND c.pos = tk.pos
      |         WHERE c.pos IS NULL),
      |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |          string_agg(tok, ' ' ORDER BY pos) AS text_scrubbed
      |        FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
      |  CAST(len(d.t) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed,
      |  COALESCE(agg.text_scrubbed, '') AS text_scrubbed
      |FROM d LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir).select(col("doc_id"), split(col("text"), " ").as("t"))
    val g = d.filter(size(col("t")) >= 5)
      .select(col("doc_id"),
        posexplode(graft.functions.NGrams.ngrams(col("t"), 5)).as(Seq("g0", "gr")))
      .select(col("doc_id"), (col("g0") + 1).as("i"),
        expr("CAST(conv(substr(md5(gr), 1, 15), 16, 10) AS BIGINT)").as("gh"))
    // duplicated-span vocabulary from the SHARED session span table
    val dup = Advanced9.spanTable(s, dir)
      .groupBy(col("gh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("gh"))
    val cov = g.join(dup, Seq("gh"))
      .select(col("doc_id"), explode(expr("sequence(i, i + 4)")).as("pos"))
      .distinct()
    val toks = d
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
    val agg = toks.join(cov, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        expr("array_join(array_sort(collect_list(struct(pos, tok))).tok, ' ')")
          .as("text_scrubbed"))
    d.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
      .orderBy(col("doc_id"))
  }

  val specs: Seq[Q] = Seq(tokenBudget, paddingWaste, adaptiveQualityGate,
    exactSubstrScrub)
}
