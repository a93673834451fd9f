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
      |  (2 * COUNT(c_custkey) * 1000000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0 AS pct_matched
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).select(col("o_custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_outer")
      .agg(
        count(lit(1)).as("n_orders"),
        count(col("c_custkey")).as("n_matched"),
        count(col("c_custkey")).as("nm"),
        count(lit(1)).as("nt"))
      .select(col("n_orders"), col("n_matched"),
        (Det.halfUpDiv(col("nm") * 1000000, col("nt")) / 10000.0).as("pct_matched"))
  }

  /** Star-schema fact QA through the library's Validation surface
    * (reference 06:52-75): build a fact_policy-shaped table from orders
    * (orderkey→policy_key, left-joined customer→customer_key so unmatched
    * facts surface as null keys, yyyyMMdd date_key, decimal premium), run
    * `Validation.schemaCheck` (column-presence introspection) and
    * `Validation.validateFactPolicy` (one-scan record/null-key/premium
    * profile), then project to oracle-deterministic dtypes. The avg is
    * recomputed boundary-exactly (integer cents + truncated-division
    * half-up, the form every rounded average in this repo uses — see
    * Analytics.conditionalAgg's comment) because validateFactPolicy's
    * decimal-division avg rounds at a different scale than DuckDB.
    */
  val factQuality = Q(
    "q21c_fact_quality",
    """WITH fact AS (
      |  SELECT o_orderkey AS policy_key,
      |         c_custkey AS customer_key,
      |         CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS premium_amount
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey)
      |SELECT COUNT(*) AS record_count,
      |  COUNT(CASE WHEN policy_key IS NULL THEN 1 END) AS null_policy_keys,
      |  COUNT(CASE WHEN customer_key IS NULL THEN 1 END) AS null_customer_keys,
      |  COUNT(CASE WHEN date_key IS NULL THEN 1 END) AS null_date_keys,
      |  CAST(SUM(premium_amount) AS DOUBLE) AS premium_sum,
      |  (2 * CAST(SUM(premium_amount) * 100 AS BIGINT) * 100 + COUNT(*))
      |    // (2 * COUNT(*)) / 10000.0 AS premium_avg,
      |  CAST(MIN(premium_amount) AS DOUBLE) AS premium_min,
      |  CAST(MAX(premium_amount) AS DOUBLE) AS premium_max,
      |  0 AS n_missing_cols, 0 AS n_unexpected_cols
      |FROM fact""".stripMargin) { (s, d) =>
    import graft.insurance.Validation
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select(col("c_custkey"))
    val fact = o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_outer")
      .select(
        col("o_orderkey").as("policy_key"),
        col("c_custkey").as("customer_key"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("date_key"),
        col("o_totalprice").cast("decimal(18,2)").as("premium_amount"))
    val (missing, extra) = Validation.schemaCheck(fact,
      Seq("policy_key", "customer_key", "date_key", "premium_amount"))
    Validation.validateFactPolicy(fact)
      .select(
        col("record_count"),
        col("null_policy_keys"), col("null_customer_keys"), col("null_date_keys"),
        col("premium_sum").cast("double").as("premium_sum"),
        (Det.halfUpDiv((col("premium_sum") * 100).cast("bigint") * 100,
          col("record_count")) / 10000.0).as("premium_avg"),
        col("premium_min").cast("double").as("premium_min"),
        col("premium_max").cast("double").as("premium_max"),
        lit(missing.size).as("n_missing_cols"),
        lit(extra.size).as("n_unexpected_cols"))
  }

  val specs: Seq[Q] = Seq(nullProfile, coverageRatio, factQuality)
}
