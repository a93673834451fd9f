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
  * driver, and one 3-sweep merge application (q135's fixpoint recipe,
  * FunctionLawsSpec). State is localCheckpoint'ed per iteration so the
  * lineage stays flat across many merges.
  *
  * Ties in pair counts break deterministically on (pair) ascending, so
  * the trained table is reproducible across partitionings and engines.
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
      .select(concat(lit(" "), regexp_replace(col("tok"), "(.)", "$1 ")).as("seq"),
        col("freq"))
      .localCheckpoint()
    val merges = mutable.Buffer.empty[(String, String)]
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
        val applied = (1 to 3).foldLeft(col("seq"))((c, _) =>
          replace(c, lit(s" $a $b "), lit(s" $a$b "))) // literal, q135's sweeps
        vocab = vocab.select(applied.as("seq"), col("freq")).localCheckpoint()
      }
    }
    merges.toSeq
  }
}
