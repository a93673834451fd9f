package graft.ops

import graft.{Q, Tables}
import graft.functions.{Deletions2, NGrams}
import org.apache.spark.sql.functions._

/** Sixth advanced batch (round 4): the depth-2 entity-resolution join
  * and the sketch-based path for cross-source overlap — the two
  * ROADMAP round-5 candidates that close the fuzzy-matching and
  * overlap-estimation surfaces.
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
    * HLL (deterministic for a given input set, but engine-specific) —
    * no DuckDB oracle; Advanced10Spec bounds the estimates against the
    * exact q103 overlaps instead.
    */
  val sourceOverlapSketch = Q.noOracle("q125_source_overlap_sketch") { (s, d) =>
    val g = Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(NGrams.ngrams(col("toks"), 3)).as("gr"))
      .select(col("source"), xxhash64(col("gr")).as("gh"))
    val sk = g.groupBy(col("source"))
      .agg(hll_sketch_agg(col("gh")).as("sk"),
        hll_sketch_estimate(hll_sketch_agg(col("gh"))).as("est_n"))
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.est_n").as("est_a"), col("b.est_n").as("est_b"),
        (col("a.est_n") + col("b.est_n")
          - hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk"))))
          .as("est_shared_raw"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        greatest(col("est_shared_raw"), lit(0L)).as("est_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val specs: Seq[Q] = Seq(fuzzyJoin2, sourceOverlapSketch)
}
