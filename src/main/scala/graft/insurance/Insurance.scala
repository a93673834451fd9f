package graft.insurance

import graft.functions.Geo
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline's domain layer, re-expressed as a composable
  * library: cleaning → dimensions → facts → risk scoring. A user of the
  * reference (satyadeep11singh/car-insurance-data-pipeline-spark) can run
  * every transformation they run today by calling these functions on
  * DataFrames with the reference's raw schemas.
  *
  * Differences from the reference are deliberate and documented:
  *  - `fact_claims` joins claims → policy on the `contract_id` natural key
  *    (the reference joins `contract_id == policy_key`, an integer
  *    surrogate — a latent type mismatch; see SURVEY.md §0 "known
  *    defects" and reference scripts/07:85-89).
  *  - Every step is lazy (no interleaved `count()` re-executions).
  *  - Numeric casts use `try_cast`: the reference runs with ANSI off, where
  *    a malformed value (the raw data really contains "$1568.11") casts to
  *    NULL and is repaired by the null-guards; under Spark 4's default
  *    ANSI mode a plain cast would abort the job instead. Dates use
  *    `try_to_date` for the same reason (the raw data contains a third,
  *    undocumented dd-MM-yyyy format in contracts.start_date).
  */
object Cleaning {

  /** Contracts cleaning — reference scripts/02_clean_contracts_data.py:43-92.
    * Name split, € strip (prefix or suffix), dual-format start_date
    * (yyyy-MM-dd else MM/dd/yyyy via LIKE dispatch), casts, null/negative
    * premium guard, load_date stamp.
    */
  def cleanContracts(raw: DataFrame, loadDate: String = "2025-12-15"): DataFrame =
    raw.select(
        col("contract_id"),
        col("client_id").as("customer_key"),
        substring_index(col("client_name"), " ", 1).as("first_name"),
        substring_index(col("client_name"), " ", -1).as("last_name"),
        regexp_replace(col("annual_premium"), "€", "").as("premium_str_clean"),
        when(col("start_date").like("____-__-__"), expr("try_to_date(start_date, 'yyyy-MM-dd')"))
          .otherwise(expr("try_to_date(start_date, 'MM/dd/yyyy')")).as("contract_start_date"),
        expr("try_to_date(end_date, 'yyyy-MM-dd')").as("contract_end_date"),
        col("product").as("product_type"),
        col("status").as("contract_status"),
        col("city_postal").as("city_postal_code"),
        col("risk_zone"),
        expr("try_cast(client_age AS INT)").as("age"),
        col("channel").as("sales_channel"),
        col("csp").as("customer_segment"),
        col("gender").as("gender_code"))
      .withColumn("annual_premium", expr("try_cast(premium_str_clean AS DOUBLE)"))
      .drop("premium_str_clean")
      .withColumn("annual_premium",
        when(col("annual_premium").isNull || col("annual_premium") < 0, lit(0.0))
          .otherwise(col("annual_premium")))
      .withColumn("load_date", lit(loadDate).cast(DateType))

  /** Vehicles cleaning — reference scripts/03:84-110. "128 HP" → 128,
    * "…€" → double, casts, fill-defaults.
    */
  def cleanVehicles(raw: DataFrame): DataFrame =
    raw.select(
        col("contract_id"), col("brand"), col("model"),
        expr("try_cast(year AS INT)").as("manufacture_year"),
        expr("try_cast(regexp_replace(power, ' HP', '') AS INT)").as("horsepower"),
        col("fuel_type"),
        expr("try_cast(regexp_replace(current_value, '€', '') AS DOUBLE)").as("market_value"),
        col("color"),
        col("usage").as("usage_type"),
        expr("try_cast(previous_claims AS INT)").as("previous_claims"))
      .na.fill(Map(
        "manufacture_year" -> 0, "horsepower" -> 0,
        "market_value" -> 0.0, "previous_claims" -> 0))

  /** Claims cleaning — reference scripts/03:167-180. Dual-format
    * occurrence_date (dd-MM-yyyy via LIKE else yyyy-MM-dd), € strip,
    * amount defaults.
    */
  def cleanClaims(raw: DataFrame): DataFrame =
    raw.select(
        col("claim_id"), col("contract_id"),
        when(col("occurrence_date").like("__-__-____"), expr("try_to_date(occurrence_date, 'dd-MM-yyyy')"))
          .otherwise(expr("try_to_date(occurrence_date, 'yyyy-MM-dd')")).as("occurrence_date"),
        expr("try_to_date(declaration_date, 'yyyy-MM-dd')").as("declaration_date"),
        col("claim_type"),
        expr("try_cast(regexp_replace(damage_amount, '€', '') AS DOUBLE)").as("damage_amount"),
        expr("try_cast(regexp_replace(indemnified_amount, '€', '') AS DOUBLE)").as("indemnified_amount"),
        col("status").as("claim_status"),
        col("expert_id"), col("liability"))
      .na.fill(0.0, Seq("damage_amount", "indemnified_amount"))

  /** Telematics cleaning — reference scripts/03:228-258. Unix-ms →
    * timestamp (second resolution, as the reference truncates), POSITION
    * "lat,lon,alt" split into typed columns, polymorphic value handling,
    * fill-defaults.
    */
  def cleanTelematics(raw: DataFrame): DataFrame = {
    val posSplit = split(col("value"), ",")
    raw
      .withColumn("event_time", from_unixtime(col("timeMili") / 1000).cast(TimestampType))
      .select(
        col("deviceId"),
        col("event_time"),
        col("timestamp").as("original_timestamp"),
        col("variable"),
        expr("try_cast(alarmClass AS INT)").as("alarmClass"),
        when(col("variable") === "POSITION", posSplit.getItem(0).cast(DoubleType))
          .otherwise(expr("try_cast(value AS DOUBLE)")).as("latitude_or_value"),
        when(col("variable") === "POSITION", posSplit.getItem(1).cast(DoubleType)).as("longitude"),
        when(col("variable") === "POSITION", posSplit.getItem(2).cast(DoubleType)).as("altitude"))
      .na.fill(Map(
        "alarmClass" -> -1,
        "latitude_or_value" -> 0.0, "longitude" -> 0.0, "altitude" -> 0.0))
  }
}

/** Star-schema dimension builders — reference scripts/04_load_dimension_tables.py. */
object Dimensions {

  /** dim_customer — reference 04:93-102 (dedup on the natural key). */
  def dimCustomer(cleanContracts: DataFrame): DataFrame =
    cleanContracts.select(
        col("customer_key"), col("first_name"), col("last_name"), col("age"),
        col("gender_code"), col("city_postal_code"), col("customer_segment"),
        col("load_date"))
      .dropDuplicates("customer_key")

  /** dim_policy with a row_number surrogate key — reference 04:118-134.
    * NOTE (scale): the global-order window funnels everything through one
    * partition; acceptable for a dimension, never for a fact. For dense
    * ids at scale use `monotonically_increasing_id` or zipWithIndex.
    */
  def dimPolicy(cleanContracts: DataFrame): DataFrame = {
    val policy = cleanContracts.select(
        col("contract_id"), col("product_type"), col("risk_zone"),
        col("sales_channel"), col("contract_status"), col("load_date"))
      .dropDuplicates("contract_id")
    policy
      .withColumn("policy_key", row_number().over(Window.orderBy("contract_id")))
      .select(col("policy_key"), col("contract_id"), col("product_type"),
        col("risk_zone"), col("sales_channel"), col("contract_status"), col("load_date"))
  }

  /** Slowly-changing-dimension Type-2 merge — the incremental update the
    * reference's overwrite-everything warehouse loads lack. `current`
    * carries (key, attrs..., valid_from, valid_to with NULL = open);
    * `updates` carries (key, attrs..., changeDateCol). Changed keys close
    * their open row at the change date and insert a new open version;
    * unknown keys insert; unchanged keys pass through untouched.
    * Null-safe attribute comparison (`<=>`), pure DataFrame ops, one
    * full-outer join on the key — scales like any key-partitioned merge.
    */
  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], changeDateCol: String): DataFrame = {
    val upd = updates.select(
      (col(key).as("u_key") +: attrs.map(a => col(a).as(s"u_$a"))) :+
        col(changeDateCol).as("u_change_date"): _*)
    val open = current.filter(col("valid_to").isNull)
    val history = current.filter(col("valid_to").isNotNull)
    val j = open.join(upd, col(key) === col("u_key"), "full_outer")
    val attrsEqual = attrs.map(a => col(a) <=> col(s"u_$a")).reduce(_ && _)
    val currentCols = (key +: attrs).map(col) :+ col("valid_from") :+ col("valid_to")
    // open rows with no update, or with an identical update
    val untouched = j.filter(col("u_key").isNull || (col(key).isNotNull && attrsEqual))
      .select(currentCols: _*)
    // changed keys: the old version closes at the change date...
    val closedOld = j.filter(col(key).isNotNull && col("u_key").isNotNull && !attrsEqual)
      .select((key +: attrs).map(col) :+ col("valid_from") :+
        col("u_change_date").as("valid_to"): _*)
    // ...and the new version (also covers brand-new keys) opens there
    val opened = j.filter(col("u_key").isNotNull && (col(key).isNull || !attrsEqual))
      .select((col("u_key").as(key) +: attrs.map(a => col(s"u_$a").as(a))) :+
        col("u_change_date").as("valid_from") :+
        lit(null).cast(DateType).as("valid_to"): _*)
    history.select(currentCols: _*)
      .unionByName(untouched)
      .unionByName(closedOld)
      .unionByName(opened)
  }

  /** Generated dim_date — reference 04:164-179 (sequence + explode). */
  def dimDate(spark: SparkSession, startDate: String, endDate: String): DataFrame =
    spark.sql(
        s"SELECT explode(sequence(to_date('$startDate'), to_date('$endDate'), interval 1 day)) AS date_key")
      .select(
        col("date_key"),
        year(col("date_key")).as("year"),
        month(col("date_key")).as("month"),
        dayofmonth(col("date_key")).as("day"),
        date_format(col("date_key"), "EEEE").as("day_of_week"),
        date_format(col("date_key"), "MMMM").as("month_name"),
        (floor((month(col("date_key")) - 1) / 3) + 1).cast("integer").as("quarter"))
}

/** Fact-table assembly — reference scripts/05 + 07. */
object Facts {

  private def dateKeyInt(c: Column): Column =
    date_format(c, "yyyyMMdd").cast("int")

  /** fact_policy_snapshot — reference 05:93-140: contracts ⋈ dim_customer
    * ⋈ dim_policy ⋈ dim_date (derived yyyyMMdd int key), measures.
    * Dimension sides are broadcast — the fact side never shuffles.
    */
  def factPolicySnapshot(cleanContracts: DataFrame, dimCustomer: DataFrame,
      dimPolicy: DataFrame, dimDate: DataFrame): DataFrame = {
    val cust = broadcast(dimCustomer.select(col("customer_key")))
    val pol = broadcast(dimPolicy.select(col("policy_key"), col("contract_id")))
    val dates = broadcast(dimDate
      .select(dateKeyInt(col("date_key")).as("date_key_int"), col("date_key")))
    cleanContracts
      .join(cust, Seq("customer_key"), "inner")
      .join(pol, Seq("contract_id"), "inner")
      .withColumn("start_date_key", dateKeyInt(col("contract_start_date")))
      .join(dates, col("start_date_key") === dates("date_key_int"), "inner")
      .select(
        col("policy_key"), col("customer_key"),
        col("start_date_key").as("date_key"),
        col("annual_premium").as("premium_amount"),
        lit(1).as("policy_count"),
        col("load_date"))
  }

  /** fact_claims — reference 07:88-130 with the corrected join: claims →
    * dim_policy on the `contract_id` NATURAL key (reference compares
    * contract_id to the integer surrogate policy_key, 07:85-89 — stale
    * comment, latent bug), then dim_date on occurrence_date.
    *
    * `strictCompat = true` replays the reference's join VERBATIM
    * (`contract_id === policy_key`, under Spark 3's legacy
    * string=int double-promotion semantics) for migration comparison
    * runs. Since contract ids are "CTR_..." strings and policy_key is
    * an integer surrogate, the replayed join matches NOTHING — the
    * reference's fact_claims loads empty on its own data, and a
    * migrator comparing warehouses must be able to reproduce exactly
    * that before deleting it. InsuranceSpec demonstrates the
    * divergence. Nobody should want this for new builds.
    */
  def factClaims(cleanClaims: DataFrame, dimPolicy: DataFrame, dimDate: DataFrame,
      strictCompat: Boolean = false): DataFrame = {
    val pol = broadcast(dimPolicy.select(col("policy_key"), col("contract_id")))
    val dates = broadcast(dimDate
      .select(dateKeyInt(col("date_key")).as("date_key_int")))
    val joined =
      if (strictCompat)
        // Spark 3 non-ANSI promotes both sides of a string=int compare
        // to DOUBLE with null on malformed input; try_cast reproduces
        // that under ANSI (a plain === would abort the job on the
        // first "CTR_..." id). On the reference's own data this
        // matches NOTHING — its fact_claims loads empty, which is the
        // behavior a migration comparison must reproduce.
        cleanClaims.join(broadcast(dimPolicy.select(col("policy_key"))),
          expr("try_cast(contract_id AS DOUBLE)") ===
            col("policy_key").cast("double"), "inner")
      else cleanClaims.join(pol, Seq("contract_id"), "inner")
    joined
      .withColumn("occurrence_date_key", dateKeyInt(col("occurrence_date")))
      .join(dates, col("occurrence_date_key") === dates("date_key_int"), "inner")
      .select(
        col("claim_id"), col("policy_key"),
        col("occurrence_date_key").as("date_key"),
        col("claim_type"),
        col("damage_amount").cast(DecimalType(18, 2)).as("claim_amount"),
        coalesce(col("indemnified_amount"), lit(0.0)).as("indemnified_amount"),
        col("claim_status"), col("liability"))
  }
}

/** Warehouse analytics — reference scripts/09_analyze_fact_metrics.py and
  * 10_analyze_customer_segments.py as library functions over the star
  * schema.
  */
object Analytics {

  /** Premium + policy counts by (year, month) — reference 09:64-88. */
  def premiumByPeriod(factPolicy: DataFrame, dimDate: DataFrame): DataFrame = {
    val dates = broadcast(dimDate.select(
      date_format(col("date_key"), "yyyyMMdd").cast("int").as("date_key_int"),
      col("year"), col("month"), col("month_name")))
    factPolicy
      .join(dates, factPolicy("date_key") === dates("date_key_int"), "inner")
      .groupBy(col("year"), col("month_name"), col("month"))
      .agg(sum(col("premium_amount")).as("total_premium"),
        sum(col("policy_count")).as("total_policies"))
      .orderBy(col("year"), col("month"))
  }

  /** Premium + policies by customer segment, ranked — reference 10:61-76. */
  def premiumBySegment(factPolicy: DataFrame, dimCustomer: DataFrame): DataFrame =
    factPolicy
      .join(broadcast(dimCustomer.select(col("customer_key"), col("customer_segment"))),
        Seq("customer_key"), "inner")
      .groupBy(col("customer_segment"))
      .agg(sum(col("premium_amount")).as("total_premium_by_segment"),
        sum(col("policy_count")).as("total_policies"))
      .orderBy(col("total_premium_by_segment").desc)
}

/** Data-quality validation — reference scripts/06_validate_data_quality.py,
  * but as ONE single-pass aggregation instead of a filter+count per column.
  */
object Validation {

  /** Flexible schema-presence check — the reference's `df.columns`
    * introspection (scripts/06:52-75) as a reusable function: which
    * expected columns are missing, which present columns are unexpected.
    */
  def schemaCheck(df: DataFrame, expected: Seq[String]): (Seq[String], Seq[String]) = {
    val actual = df.columns.toSeq
    (expected.filterNot(actual.contains), actual.filterNot(expected.contains))
  }

  /** QA summary over the policy fact: counts, null keys, premium stats. */
  def validateFactPolicy(factPolicy: DataFrame): DataFrame =
    factPolicy.agg(
      count(lit(1)).as("record_count"),
      count(when(col("policy_key").isNull, 1)).as("null_policy_keys"),
      count(when(col("customer_key").isNull, 1)).as("null_customer_keys"),
      count(when(col("date_key").isNull, 1)).as("null_date_keys"),
      sum(col("premium_amount")).as("premium_sum"),
      avg(col("premium_amount")).as("premium_avg"),
      min(col("premium_amount")).as("premium_min"),
      max(col("premium_amount")).as("premium_max"))
}

/** Telematics → driver risk scoring — reference scripts/08:200-285,
  * exact thresholds and formula.
  */
object Risk {
  val SpeedingThreshold = 110.0 // km/h, reference 08:51
  val ImpossibleSpeed = 160.0   // km/h, reference 08:52
  val SpeedCap = 300.0          // km/h, reference 08:53

  /** Per-device speed computation from consecutive GPS fixes:
    * lag window (device, event_time) → time delta → Haversine → speed,
    * capped and GPS-error-filtered. Reference 08:208-255.
    *
    * Scale note: with few devices this window skews (the reference's data
    * has 3 devices — SURVEY §7); the operator itself is correct for any
    * device cardinality, and high-cardinality keys are the deploy-time fix.
    */
  def deviceSpeeds(cleanTelematics: DataFrame): DataFrame = {
    val w = Window.partitionBy("deviceId").orderBy("event_time")
    cleanTelematics
      .filter(col("variable") === "POSITION")
      .select(col("deviceId"), col("event_time"),
        col("latitude_or_value"), col("longitude"))
      .withColumn("prev_lat", lag("latitude_or_value", 1).over(w))
      .withColumn("prev_long", lag("longitude", 1).over(w))
      .withColumn("prev_time", lag("event_time", 1).over(w))
      .withColumn("time_diff_sec",
        col("event_time").cast("long") - col("prev_time").cast("long"))
      .filter(col("time_diff_sec") > 0)
      .withColumn("dist_km", Geo.haversineKm(
        col("prev_lat"), col("prev_long"), col("latitude_or_value"), col("longitude")))
      .na.fill(Map("dist_km" -> 0.0))
      .withColumn("speed_kmh",
        when(col("time_diff_sec") > 0,
          col("dist_km") / col("time_diff_sec") * 3600.0).otherwise(0.0))
      .withColumn("speed_kmh",
        when(col("speed_kmh") > SpeedCap, SpeedCap).otherwise(col("speed_kmh")))
      .na.fill(Map("speed_kmh" -> 0.0))
      .filter(col("speed_kmh") < ImpossibleSpeed)
  }

  /** Risk features + 0-100 score + band — reference 08:261-285:
    * score = 100 − 5·speeding_incidents − avg_speed/20 (when any
    * speeding), clamped at 0; bands at 80/60/40.
    */
  def riskScores(speeds: DataFrame): DataFrame =
    speeds.groupBy(col("deviceId"))
      .agg(
        count(when(col("speed_kmh") > SpeedingThreshold, 1)).as("speeding_incidents"),
        avg(col("speed_kmh")).as("avg_speed"),
        max(col("speed_kmh")).as("max_speed"),
        count(col("event_time")).as("total_events"))
      .withColumn("driver_risk_score",
        when(col("speeding_incidents") > 0,
          lit(100) - col("speeding_incidents") * 5 - col("avg_speed") / 20)
          .otherwise(lit(100)))
      .withColumn("driver_risk_score",
        when(col("driver_risk_score") < 0, 0).otherwise(col("driver_risk_score")))
      .withColumn("risk_category",
        when(col("driver_risk_score") >= 80, "SAFE")
          .when(col("driver_risk_score") >= 60, "MODERATE")
          .when(col("driver_risk_score") >= 40, "RISKY")
          .otherwise("VERY_RISKY"))

  /** Device → customer mapping join for the warehouse load — reference
    * 08:104-136 (device_mapping ⋈ dim_customer).
    */
  def mapToCustomers(scored: DataFrame, deviceMapping: DataFrame,
      dimCustomer: DataFrame): DataFrame =
    scored
      .join(broadcast(deviceMapping), Seq("deviceId"), "inner")
      .join(broadcast(dimCustomer.select(col("customer_key"))),
        col("customer_id") === col("customer_key"), "inner")
      .select(col("customer_key"), col("deviceId"),
        col("driver_risk_score"), col("risk_category"),
        col("speeding_incidents"), col("avg_speed"), col("max_speed"),
        col("total_events"))
}
