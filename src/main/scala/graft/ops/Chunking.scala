package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Training-sequence preparation: document chunking (fixed token windows
  * with overlap) and sequence packing (greedy binning of short documents
  * into fixed token budgets) — the two transforms between "cleaned
  * corpus" and "batches a trainer can consume".
  */
object Chunking {

  private val ChunkTokens = 32
  private val Stride = 24 // 8-token overlap

  /** Split each document into overlapping fixed-size token chunks. The
    * chunk windows come from one `transform(sequence(...))` projection —
    * narrow, codegen-planned, no shuffle until the final orderBy; at
    * 100 TB this streams at scan speed.
    */
  val chunk = Q(
    "q67_chunking",
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 100),
      |chunks AS (
      |  SELECT doc_id, CAST(i // $Stride AS INTEGER) AS chunk_id,
      |    array_to_string(t[i+1:i+$ChunkTokens], ' ') AS chunk_text,
      |    CAST(LEAST(len(t) - i, $ChunkTokens) AS INTEGER) AS n_tokens
      |  FROM toks, (SELECT unnest(range(0, 100000, $Stride)) AS i)
      |  WHERE i < len(t))
      |SELECT doc_id, chunk_id, chunk_text, n_tokens
      |FROM chunks
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 100)
      .withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(t) - 1, $Stride), " +
          s"i -> struct(concat_ws(' ', slice(t, i + 1, $ChunkTokens)) AS chunk_text, " +
          s"CAST(least(size(t) - i, $ChunkTokens) AS INT) AS n_tokens))"))
        .as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id"),
        col("c.chunk_text").as("chunk_text"), col("c.n_tokens").as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val PackBudget = 512

  /** Greedy sequence packing: documents (in doc_id order, per language)
    * accumulate into packs of ~512 tokens — running token count via a
    * window cumsum, pack id = cumsum DIV budget. One shuffle on the
    * partition key; the greedy assignment itself is a window pass.
    */
  val pack = Q(
    "q68_sequence_packing",
    s"""WITH sized AS (
      |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, lang, n_toks,
      |    CAST((SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks)
      |      // $PackBudget AS BIGINT) AS pack_id
      |  FROM sized)
      |SELECT lang, pack_id,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS pack_tokens,
      |  MIN(doc_id) AS first_doc
      |FROM packed
      |GROUP BY lang, pack_id
      |ORDER BY lang, pack_id""".stripMargin) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("pack_id",
        expr(s"(SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks) DIV $PackBudget"))
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang"), col("pack_id"))
  }

  val specs: Seq[Q] = Seq(chunk, pack)
}
