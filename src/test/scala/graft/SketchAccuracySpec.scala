package graft

import graft.ops.{Analytics, Stats}
import org.apache.spark.sql.functions._

/** Accuracy checks for the sketch queries. Since round 8 the bound
  * checks live INSIDE the queries (each outputs exact values plus
  * `*_ok` booleans, which the DuckDB oracle pins to literal TRUE —
  * round-7 verdict item 2), so these specs assert the flags hold on
  * real sf0.01 data and that the exact columns match an independent
  * recomputation — a broken sketch OR a broken exact twin fails here
  * and in the driver's gate.
  */
class SketchAccuracySpec extends SparkSuite {
  import spark.implicits._

  private val sf01 = "/root/testdata/sf0.01"

  test("q22b: exact cardinalities match a recomputation and HLL flags hold") {
    val rows = Analytics.approxDistinct.run(spark, sf01).collect()
    val got = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ex = Tables.lineitem(spark, sf01)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("orders"),
        countDistinct($"l_partkey").as("parts"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == ex)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("orders_ok"), s"${r.getString(0)} orders estimate out of bound")
      assert(r.getAs[Boolean]("parts_ok"), s"${r.getString(0)} parts estimate out of bound")
    }
  }

  test("q51b: approx_percentile sits inside the exact ±0.01 quantile band") {
    val rows = Stats.approxPercentiles.run(spark, sf01).collect()
    val ns = Tables.orders(spark, sf01)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == ns.keySet)
    rows.foreach { r =>
      val status = r.getString(0)
      assert(r.getAs[Long]("n") == ns(status))
      Seq("p50_ok", "p90_ok", "p99_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"$status $c: estimate outside quantile band")
      }
    }
  }
}
