package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Statistical aggregate family: exact percentiles, histograms, dispersion
  * and correlation. The exact percentile is a per-group sort — fine for
  * grouped dims; the 100 TB path for a global quantile is
  * `approx_percentile` (one-pass, mergeable sketch), exposed as the
  * bounds-checked variant q51b.
  */
object Stats {

  /** Exact interpolated percentiles, global and per order status. */
  val percentiles = Q(
    "q51_percentiles",
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  /** Sketch-based percentiles (one-pass, mergeable): the global-quantile
    * scale path. The raw estimates are engine-specific, so the
    * oracle-checkable form asserts each estimate lands between the exact
    * quantiles ±0.01 in rank-fraction — `approx_percentile(…, 1000)`
    * guarantees rank error ≤ n/1000, i.e. 10× inside that band — and the
    * oracle emits the group size and literal TRUE per check.
    */
  val approxPercentiles = Q(
    "q51b_approx_percentiles",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val ok = (i: Int) =>
      col("ap").getItem(i) >= col("lo").getItem(i) &&
        col("ap").getItem(i) <= col("hi").getItem(i)
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 1000)").as("ap"),
        expr("percentile(o_totalprice, array(0.49, 0.89, 0.98))").as("lo"),
        expr("percentile(o_totalprice, array(0.51, 0.91, 1.0))").as("hi"))
      .select(col("o_orderstatus"), col("n"),
        ok(0).as("p50_ok"), ok(1).as("p90_ok"), ok(2).as("p99_ok"))
      .orderBy(col("o_orderstatus"))
  }

  /** Fixed-width histogram of order values (bucket = 50k): a groupBy on a
    * derived bucket key — single shuffle of bucket-count pairs.
    */
  val histogram = Q(
    "q52_histogram",
    """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS bucket_lo,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_sum
      |FROM orders
      |GROUP BY 1
      |ORDER BY bucket_lo""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy((floor(col("o_totalprice") / 50000) * 50000).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("bucket_sum"))
      .orderBy(col("bucket_lo"))
  }

  /** Dispersion + correlation: stddev/variance (sample), Pearson corr,
    * sample covariance. Rounded to absorb one-pass vs two-pass float
    * differences between engines.
    */
  val dispersion = Q(
    "q53_dispersion",
    """SELECT l_returnflag,
      |  ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
      |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val specs: Seq[Q] = Seq(percentiles, approxPercentiles, histogram, dispersion)
}
