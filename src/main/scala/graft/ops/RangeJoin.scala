package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Interval/range join — absent from both Spark and the reference.
  *
  * Naive form: `a JOIN b ON b.ts BETWEEN a.ts AND a.ts + δ` plans as a
  * broadcast nested-loop (O(n²) comparisons) — unusable at scale. The
  * banded-bucket form here quantizes time into δ-width buckets, joins on
  * the bucket equi-key (each left row probes its own and the next
  * bucket), then applies the exact range predicate — an equi-shuffle join
  * with O(matches) refinement, which is how range joins are done on
  * engines without a native interval operator.
  */
object RangeJoin {

  private val DeltaUs = 100000L // 100 ms

  /** Cross-user event pairs within 100 ms of each other. */
  val rangeJoin = Q(
    "q55_range_join",
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS ts_us FROM events)
      |SELECT a.event_id AS ea, b.event_id AS eb,
      |  b.ts_us - a.ts_us AS gap_us
      |FROM e a JOIN e b
      |  ON b.ts_us >= a.ts_us AND b.ts_us - a.ts_us <= 100000
      | AND a.user_id <> b.user_id AND a.event_id < b.event_id
      |ORDER BY ea, eb""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val e = ev
      .select(col("event_id"), col("user_id"), Tables.tsUs(ev).as("ts_us"))
    // left side probes its own bucket and the next (a match within δ can
    // only land there); right side sits in its home bucket.
    val left = e
      .withColumn("bucket", explode(array(expr(s"ts_us DIV $DeltaUs"),
        expr(s"ts_us DIV $DeltaUs + 1"))))
      .select(col("event_id").as("ea"), col("user_id").as("ua"),
        col("ts_us").as("ta"), col("bucket"))
    val right = e
      .select(col("event_id").as("eb"), col("user_id").as("ub"),
        col("ts_us").as("tb"), expr(s"ts_us DIV $DeltaUs").as("bucket"))
    left.join(right, Seq("bucket"))
      .filter(col("tb") >= col("ta") && col("tb") - col("ta") <= DeltaUs &&
        col("ua") =!= col("ub") && col("ea") < col("eb"))
      // no dedup needed: tb's home bucket equals exactly one of the two
      // probed buckets, so each qualifying pair joins exactly once
      .select(col("ea"), col("eb"), (col("tb") - col("ta")).as("gap_us"))
      .orderBy(col("ea"), col("eb"))
  }

  val specs: Seq[Q] = Seq(rangeJoin)
}
