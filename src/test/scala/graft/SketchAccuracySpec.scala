package graft

import graft.ops.{Analytics, Stats}
import org.apache.spark.sql.functions._

/** Accuracy bounds for the two sketch queries that report `no_oracle`
  * in the correctness gate (round-5 verdict item 4): their estimates are
  * engine-specific so they can't hash-match DuckDB, but they CAN be
  * bounded against the exact computation — mirroring Advanced10Spec's
  * q125 HLL treatment, so a broken sketch wiring fails CI instead of
  * shipping silently.
  */
class SketchAccuracySpec extends SparkSuite {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"

  test("q22b approx_count_distinct lands within the HLL error bound of exact") {
    val approx = Analytics.approxDistinct.run(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ex = Tables.lineitem(spark, sf01)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("orders"),
        countDistinct($"l_partkey").as("parts"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == ex.keySet)
    // Spark's default rsd is 0.05; allow 4 standard errors plus a small
    // absolute floor for tiny groups.
    def ok(est: Long, truth: Long): Boolean =
      math.abs(est - truth) <= math.max(4 * 0.05 * truth, 8.0)
    ex.foreach { case (flag, (o, p)) =>
      val (ao, ap) = approx(flag)
      info(f"$flag: orders $ao vs $o, parts $ap vs $p")
      assert(ok(ao, o), s"$flag approx_orders $ao outside HLL bound of $o")
      assert(ok(ap, p), s"$flag approx_parts $ap outside HLL bound of $p")
    }
  }

  test("q51b approx_percentile lands within rank tolerance of the true quantile") {
    val approx = Stats.approxPercentiles.run(spark, sf01)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val orders = Tables.orders(spark, sf01)
      .select($"o_orderstatus", $"o_totalprice").cache()
    val ns = orders.groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ps = Seq(0.5, 0.9, 0.99)
    for ((status, ests) <- approx; (p, est) <- ps.zip(ests)) {
      val n = ns(status)
      val below = orders.filter($"o_orderstatus" === status && $"o_totalprice" <= est)
        .count()
      // accuracy 1000 → rank error ≤ n/1000; allow double plus a floor
      val tol = math.max(2.0 * n / 1000.0, 2.0)
      assert(math.abs(below - p * n) <= tol,
        f"$status p$p: est $est%.2f has rank $below of $n (target ${p * n}%.1f ± $tol%.1f)")
    }
    orders.unpersist()
  }
}
