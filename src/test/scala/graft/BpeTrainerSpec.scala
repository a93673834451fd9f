package graft

import graft.functions.BpeTrainer
import org.apache.spark.sql.functions._

/** Distributed BPE training against an exhaustive single-machine
  * reference (same algorithm, same tie-break, independent code), plus
  * the provenance lock: q135's applied merge table IS what training on
  * its corpus produces.
  */
class BpeTrainerSpec extends SparkSuite {
  import spark.implicits._

  /** Reference trainer: exact frequency-weighted pair counting over
    * in-memory segmentations, merges applied to fixpoint, ties broken
    * (count desc, pair asc) like the distributed trainer.
    */
  private def referenceTrain(words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var seqs: Map[String, (Seq[String], Long)] =
      words.map { case (w, f) => w -> (w.map(_.toString): Seq[String], f) }
    val out = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    while (out.size < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.values.foreach { case (seq, f) =>
        seq.zip(seq.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val live = counts.filter(_._2 >= 2L)
      if (live.isEmpty) done = true
      else {
        val (pair, _) = live.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += pair
        val (a, b) = pair
        seqs = seqs.map { case (w, (seq, f)) =>
          var s = seq
          var changed = true
          while (changed) {
            changed = false
            val nxt = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                nxt += (a + b); i += 2; changed = true
              } else { nxt += s(i); i += 1 }
            }
            s = nxt.toSeq
          }
          w -> (s, f)
        }
      }
    }
    out.toSeq
  }

  test("distributed training equals the exhaustive reference on real data") {
    val docs = Tables.documents(spark, sf0001)
    val words = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = BpeTrainer.train(docs, "text", 10)
    val want = referenceTrain(words, 10)
    assert(got == want)
    assert(got.size == 10)
  }

  test("q135's applied table is what training on its corpus produces") {
    val trained = BpeTrainer.train(
      Tables.documents(spark, "/root/testdata/sf0.01"), "text", 10)
    assert(trained == ops.Advanced11.BpeMerges,
      s"q135 applies $trained-incompatible table ${ops.Advanced11.BpeMerges}")
  }

  test("training stops early when nothing repeats") {
    // every adjacent pair occurs exactly once -> no mergeable pair
    val df = Seq("ab", "cd", "ef").toDF("text")
    assert(BpeTrainer.train(df, "text", 5).isEmpty)
  }
}
