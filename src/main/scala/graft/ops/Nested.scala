package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Nested/complex-type surface: struct construction + field access,
  * array-of-struct explode, regex multi-extraction — the column shapes a
  * multimodal metadata pipeline carries (typed metadata structs next to
  * opaque payloads).
  */
object Nested {

  /** Struct round-trip: pack per-document metadata into a struct column,
    * explode an array of (field, value) structs out of it, re-aggregate.
    */
  val structMeta = Q(
    "q61_struct_meta",
    """WITH meta AS (
      |  SELECT doc_id,
      |    struct_pack(lang := lang, chars := n_chars,
      |                toks := CAST(len(string_split(text, ' ')) AS BIGINT)) AS m
      |  FROM documents)
      |SELECT m.lang AS lang,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(m.chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(m.toks) AS BIGINT) AS total_toks,
      |  CAST(MAX(m.chars) AS BIGINT) AS max_chars
      |FROM meta
      |GROUP BY m.lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        struct(
          col("lang").as("lang"),
          col("n_chars").as("chars"),
          size(split(col("text"), " ")).cast("long").as("toks")).as("m"))
      .groupBy(col("m.lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("m.chars")).as("total_chars"),
        sum(col("m.toks")).as("total_toks"),
        max(col("m.chars")).as("max_chars"))
      .orderBy(col("lang"))
  }

  /** Regex multi-extraction: pull every integer out of the JSON props
    * strings and aggregate them per event type.
    */
  val regexExtractAll = Q(
    "q61b_regex_extract_all",
    """WITH nums AS (
      |  SELECT event_type,
      |    list_transform(regexp_extract_all(props, '-?\d+'), x -> x::BIGINT) AS ns
      |  FROM events)
      |SELECT event_type,
      |  CAST(SUM(len(ns)) AS BIGINT) AS n_numbers,
      |  CAST(SUM(list_sum(ns)) AS BIGINT) AS total,
      |  CAST(MAX(list_max(ns)) AS BIGINT) AS max_number
      |FROM nums
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        expr("transform(regexp_extract_all(props, '-?\\\\d+', 0), x -> CAST(x AS BIGINT))").as("ns"))
      .groupBy(col("event_type"))
      .agg(
        sum(size(col("ns"))).as("n_numbers"),
        sum(expr("aggregate(ns, CAST(0 AS BIGINT), (a, x) -> a + x)")).as("total"),
        max(expr("array_max(ns)")).as("max_number"))
      .orderBy(col("event_type"))
  }

  /** Edit-distance near-dup: Levenshtein over document prefixes inside
    * language buckets (blocking keeps the pairwise work bounded — the
    * same confinement principle as LSH bands). The doc_id bound marks
    * this as the exact ground-truth harness, like q31/q42: language
    * buckets alone grow quadratically with the corpus. The unbounded
    * scale paths for edit distance are q110/q124's symmetric-delete
    * blocking (EXACT for radius ≤ 1/≤ 2 — the radii dedup actually
    * uses); a radius-20 prefix scan like this one has no sub-quadratic
    * exact blocking and stays an oracle-domain query by design.
    */
  val editDistance = Q(
    "q62_edit_distance",
    """WITH p AS (
      |  SELECT doc_id, lang, substr(text, 1, 40) AS prefix
      |  FROM documents WHERE doc_id < 150)
      |SELECT a.doc_id AS da, b.doc_id AS db,
      |  CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS dist
      |FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.prefix, b.prefix) <= 20
      |ORDER BY da, db""".stripMargin) { (s, d) =>
    val p = Tables.documents(s, d).filter(col("doc_id") < 150)
      .select(col("doc_id"), col("lang"), substring(col("text"), 1, 40).as("prefix"))
    p.as("a").join(p.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", levenshtein(col("a.prefix"), col("b.prefix")))
      .filter(col("dist") <= 20)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"), col("dist"))
      .orderBy(col("da"), col("db"))
  }

  val specs: Seq[Q] = Seq(structMeta, regexExtractAll, editDistance)
}
