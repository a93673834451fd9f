package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE TRAINING — the full iterative loop (count adjacent
  * pairs → merge the argmax → recount on the updated segmentation),
  * closing the tokenizer family: q106 pre-tokenizes, q128 is exactly ONE
  * iteration of this loop, q135/q139 APPLY a trained table.
  *
  * Scale shape: the corpus is touched ONCE (word-frequency aggregation,
  * map-side combined); every iteration after that runs on the
  * VOCABULARY-sized table, which carries each word's current
  * segmentation as a spaced-symbol string. Per iteration: one
  * Generate+element_at pair expansion (codegen'd — no interpreted
  * lambdas) feeding a freq-weighted pair count, a 1-row argmax to the
  * driver, and one merge application via the SHARED sweep kernel
  * ([[graft.ops.Advanced11.mergeSweeps]] — trainer and encoder apply
  * rules through one definition, so the provenance lock is structural;
  * see its scaladoc for the sweep-vs-token-greedy semantics note).
  * State localCheckpoints every 8 iterations: between checkpoints the
  * lineage is a handful of stacked narrow projections, and batching
  * bounds how many materialized copies exist before the ContextCleaner
  * reclaims dropped ones.
  *
  * Ties in pair counts break deterministically on (pair) ascending —
  * Spark's binary UTF-8 string order, which equals Java's UTF-16 order
  * on ASCII symbol alphabets (non-BMP symbols would order differently;
  * tokenizer symbol tables are ASCII-safe in practice).
  */
object BpeTrainer {

  /** Learn `numMerges` merge rules from a text column; returns them in
    * rank order (the order [[graft.ops.Advanced11.BpeMerges]]-style
    * apply tables consume). Stops early if no pair occurs twice.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    var vocab = df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .select(graft.ops.Advanced11.spacedSymbols(col("tok")).as("seq"), col("freq"))
      .localCheckpoint()
    val merges = mutable.Buffer.empty[(String, String)]
    var sinceCheckpoint = 0
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val top = vocab
        .select(col("freq"), split(trim(col("seq")), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(expr("sequence(0, size(syms) - 2)")).as("i"), col("syms"))
        .select(col("freq"),
          expr("element_at(syms, i + 1)").as("a"),
          expr("element_at(syms, i + 2)").as("b"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("freq")).as("n"))
        .filter(col("n") >= 2) // a pair seen once compresses nothing
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += ((a, b))
        val applied = graft.ops.Advanced11.mergeSweeps(col("seq"), a, b)
        vocab = vocab.select(applied.as("seq"), col("freq"))
        sinceCheckpoint += 1
        if (sinceCheckpoint == 8) { // flat lineage, bounded live copies
          vocab = vocab.localCheckpoint()
          sinceCheckpoint = 0
        }
      }
    }
    merges.toSeq
  }
}
