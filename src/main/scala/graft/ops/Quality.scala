package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Data-quality/validation family — the reference's
  * scripts/06_validate_data_quality.py as single-pass aggregations.
  *
  * The reference counts nulls one filter+count action per column
  * (06:60-65), i.e. N full scans; here the whole profile is ONE scan with
  * conditional counts — the only form that survives 100 TB.
  */
object Quality {

  /** Single-pass null/validity profile over orders. */
  val nullProfile = Q(
    "q21_null_profile",
    """SELECT
      |  COUNT(*) AS n_rows,
      |  COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_custkey,
      |  COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS null_totalprice,
      |  COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_orderdate,
      |  COUNT(CASE WHEN o_totalprice < 0 THEN 1 END) AS neg_totalprice,
      |  COUNT(DISTINCT o_orderstatus) AS n_statuses
      |FROM orders""".stripMargin) { (s, d) =>
    Tables.orders(s, d).agg(
      count(lit(1)).as("n_rows"),
      count(when(col("o_custkey").isNull, 1)).as("null_custkey"),
      count(when(col("o_totalprice").isNull, 1)).as("null_totalprice"),
      count(when(col("o_orderdate").isNull, 1)).as("null_orderdate"),
      count(when(col("o_totalprice") < 0, 1)).as("neg_totalprice"),
      countDistinct(col("o_orderstatus")).as("n_statuses"))
  }

  /** Referential-coverage check: fraction of orders whose customer exists
    * (reference 06:68-75 vehicle-coverage ratio pattern).
    */
  val coverageRatio = Q(
    "q21b_coverage_ratio",
    """SELECT
      |  COUNT(*) AS n_orders,
      |  COUNT(c_custkey) AS n_matched,
      |  ROUND(COUNT(c_custkey) * 100.0 / COUNT(*), 4) AS pct_matched
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(col("o_custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_outer")
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("c_custkey")).as("n_matched"),
        round(count(col("c_custkey")) * 100.0 / count(lit(1)), 4).as("pct_matched"))
  }

  val specs: Seq[Q] = Seq(nullProfile, coverageRatio)
}
