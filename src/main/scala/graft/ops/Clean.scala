package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Messy-data cleaning family: the reference's schema-enforcement layer
  * (scripts/02_clean_contracts_data.py, 03_clean_multisource_data.py)
  * re-expressed on the harness tables.
  *
  * Covered semantics: first/last-token name split (substring_index, 02:50-51),
  * currency-symbol strip prefix AND suffix (regexp_replace, 02:54 / 03:93),
  * unit-suffix strip "N HP" (03:90), composite-field split + element
  * extraction (03:230,240-244), dual-format date dispatch via LIKE pattern
  * (02:60-61 / 03:171-172), null/negative guards (02:86-89), fill-defaults
  * (03:105-110).
  *
  * All of it is narrow (no shuffle): one projection pipeline fused by
  * whole-stage codegen, so it streams at scan speed on any cluster size.
  */
object Clean {

  /** String cleaning: token split, regexp strip, array split + getItem. */
  val cleanStrings = Q(
    "q04_clean_strings",
    """SELECT p_partkey,
      |  split_part(p_name, ' ', 1)  AS first_token,
      |  split_part(p_name, ' ', -1) AS last_token,
      |  regexp_replace(p_type, ' ', '_', 'g') AS type_key,
      |  string_split(p_name, ' ')[1] AS tok0,
      |  string_split(p_name, ' ')[2] AS tok1,
      |  CAST(regexp_replace(p_size || ' HP', ' HP', '') AS INTEGER) AS power_hp
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      substring_index(col("p_name"), " ", 1).as("first_token"),
      substring_index(col("p_name"), " ", -1).as("last_token"),
      regexp_replace(col("p_type"), " ", "_").as("type_key"),
      split(col("p_name"), " ").getItem(0).as("tok0"),
      split(col("p_name"), " ").getItem(1).as("tok1"),
      regexp_replace(concat(col("p_size").cast("string"), lit(" HP")), lit(" HP"), lit(""))
        .cast("int").as("power_hp"))
      .orderBy(col("p_partkey"))
  }

  /** Dual-format date dispatch: the reference's `when(like '____-__-__')`
    * pattern (02:60-61). Mixed-format strings are synthesized
    * deterministically from o_orderdate (even keys ISO, odd keys US),
    * then parsed back with the LIKE dispatch.
    */
  val dualFormatDates = Q(
    "q05_dual_format_dates",
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
      |         ELSE strftime(o_orderdate, '%m/%d/%Y') END AS date_str
      |  FROM orders)
      |SELECT o_orderkey, date_str,
      |  CASE WHEN date_str LIKE '____-__-__' THEN CAST(strptime(date_str, '%Y-%m-%d') AS DATE)
      |       ELSE CAST(strptime(date_str, '%m/%d/%Y') AS DATE) END AS parsed_date
      |FROM raw
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .otherwise(date_format(col("o_orderdate"), "MM/dd/yyyy")).as("date_str"))
      .withColumn("parsed_date",
        when(col("date_str").like("____-__-__"), to_date(col("date_str"), "yyyy-MM-dd"))
          .otherwise(to_date(col("date_str"), "MM/dd/yyyy")))
      .orderBy(col("o_orderkey"))
  }

  /** Currency-symbol strip, € as prefix or suffix (02:54, 03:93). */
  val currencyStrip = Q(
    "q06_currency_strip",
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 2 = 0
      |         THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '€'
      |         ELSE '€' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) END AS price_str
      |  FROM orders)
      |SELECT o_orderkey, price_str,
      |  CAST(regexp_replace(price_str, '€', '') AS DOUBLE) AS price
      |FROM raw
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val dec = col("o_totalprice").cast(DecimalType(18, 2)).cast("string")
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0, concat(dec, lit("€")))
          .otherwise(concat(lit("€"), dec)).as("price_str"))
      .withColumn("price", regexp_replace(col("price_str"), "€", "").cast("double"))
      .orderBy(col("o_orderkey"))
  }

  /** Null/negative guard + fill-defaults: premium guard (02:86-89) and
    * fillna map (03:105-110). Nulls synthesized via NULLIF-style CASE.
    */
  val nullGuards = Q(
    "q07_null_guards",
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS maybe_price,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS maybe_prio
      |  FROM orders)
      |SELECT o_orderkey,
      |  CASE WHEN maybe_price IS NULL OR maybe_price < 0 THEN 0.0 ELSE maybe_price END AS price_clean,
      |  COALESCE(maybe_prio, 'UNKNOWN') AS prio_clean
      |FROM raw
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "P", lit(null)).otherwise(col("o_totalprice")).as("maybe_price"),
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderpriority")).as("maybe_prio"))
      .withColumn("price_clean",
        when(col("maybe_price").isNull || col("maybe_price") < 0, lit(0.0))
          .otherwise(col("maybe_price")))
      .na.fill(Map("maybe_prio" -> "UNKNOWN"))
      .withColumnRenamed("maybe_prio", "prio_clean")
      .drop("maybe_price")
      .orderBy(col("o_orderkey"))
  }

  val specs: Seq[Q] = Seq(cleanStrings, dualFormatDates, currencyStrip, nullGuards)
}
