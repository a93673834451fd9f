package graft

import graft.insurance._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Date

/** Cleaning/dimension/fact/risk semantics on insurance-shaped literal
  * fixtures mirroring the reference's raw data (FIXTURES.md §B).
  */
class InsuranceSpec extends SparkSuite {
  import spark.implicits._

  private val rawContracts = Seq(
    // dual date formats, € suffix, two-token name
    ("CTR_000001", "CLI_000001", "Pascal Dubois", "Life", "11/08/2023", "2024-09-08",
      "1974.98€", "Renewed", "Paris_75001", "High", 50.0, "Agency", null: String, "F"),
    // € prefix, ISO start date, three-token name (middle collapses into last token)
    ("CTR_000002", "CLI_000002", "Sophie de Simon", "Auto", "2025-08-12", "2026-08-15",
      "€620.93", "Active", "Bordeaux_33000", "Medium", 43.0, "Phone", "Worker", "F"),
    // negative premium -> guarded to 0.0
    ("CTR_000003", "CLI_000003", "Jean Martin", "Home", "2024-01-05", "2025-01-05",
      "-5.00€", "Active", "Lyon_69000", "Low", 30.0, "Web", "Manager", "M"))
    .toDF("contract_id", "client_id", "client_name", "product", "start_date", "end_date",
      "annual_premium", "status", "city_postal", "risk_zone", "client_age", "channel",
      "csp", "gender")

  private lazy val contracts = Cleaning.cleanContracts(rawContracts)

  test("contracts: dual-format start dates parse to the same calendar dates") {
    val dates = contracts.orderBy("contract_id")
      .select("contract_start_date").as[Date].collect()
    assert(dates(0) == Date.valueOf("2023-11-08")) // MM/dd/yyyy
    assert(dates(1) == Date.valueOf("2025-08-12")) // yyyy-MM-dd
  }

  test("contracts: currency strip handles prefix and suffix, negative guarded to 0") {
    val p = contracts.orderBy("contract_id").select("annual_premium").as[Double].collect()
    assert(p sameElements Array(1974.98, 620.93, 0.0))
  }

  test("contracts: name splits to first/last whitespace token") {
    val r = contracts.filter($"contract_id" === "CTR_000002")
      .select("first_name", "last_name").head()
    assert(r == Row("Sophie", "Simon"))
  }

  test("contracts: age cast to int, load_date stamped") {
    val r = contracts.filter($"contract_id" === "CTR_000001")
      .select("age", "load_date").head()
    assert(r.getInt(0) == 50)
    assert(r.getDate(1) == Date.valueOf("2025-12-15"))
  }

  test("vehicles: HP strip, currency strip, null defaults") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("contract_id", StringType), StructField("brand", StringType),
      StructField("model", StringType), StructField("year", DoubleType),
      StructField("power", StringType), StructField("fuel_type", StringType),
      StructField("current_value", StringType), StructField("color", StringType),
      StructField("usage", StringType), StructField("previous_claims", DoubleType)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("CTR_000003", "BMW", "Serie1", 2022.0, "128 HP", "Gasoline", "29567.77€", "Gray", "Mixed", 0.0),
        Row("CTR_000005", "Renault", "Megane", null, null, "Hybrid", null, "Black", "Personal", null))),
      schema)
    val v = Cleaning.cleanVehicles(raw).orderBy("contract_id").collect()
    assert(v(0).getAs[Int]("horsepower") == 128)
    assert(v(0).getAs[Double]("market_value") == 29567.77)
    assert(v(1).getAs[Int]("manufacture_year") == 0)
    assert(v(1).getAs[Int]("horsepower") == 0)
    assert(v(1).getAs[Double]("market_value") == 0.0)
    assert(v(1).getAs[Int]("previous_claims") == 0)
  }

  test("claims: dd-MM-yyyy vs yyyy-MM-dd dispatch, empty amount -> 0.0") {
    val raw = Seq(
      ("CLM_0000001", "CTR_000001", "26-11-2023", "2023-10-02", "Theft",
        "15213.03€", "10977.27€", "Closed", "EXP_013", "Third_party"),
      ("CLM_0000002", "CTR_000002", "2025-08-26", "2025-08-28", "Fire",
        "2321.55€", null: String, "Expert_review", "EXP_013", "Third_party"))
      .toDF("claim_id", "contract_id", "occurrence_date", "declaration_date", "claim_type",
        "damage_amount", "indemnified_amount", "status", "expert_id", "liability")
    val c = Cleaning.cleanClaims(raw).orderBy("claim_id").collect()
    assert(c(0).getAs[Date]("occurrence_date") == Date.valueOf("2023-11-26"))
    assert(c(1).getAs[Date]("occurrence_date") == Date.valueOf("2025-08-26"))
    assert(c(1).getAs[Double]("indemnified_amount") == 0.0)
  }

  private val rawTelematics = Seq(
    ("dev1", 1.597603202e12, "2020-08-17 00:00:02.000000", "86.0", "INTERNAL BATTERY",
      0L.asInstanceOf[java.lang.Long]),
    ("dev1", 1.597603203e12, "2020-08-17 00:00:03.000000", "13.330059,74.74467,-12.0",
      "POSITION", null.asInstanceOf[java.lang.Long]))
    .toDF("deviceId", "timeMili", "timestamp", "value", "variable", "alarmClass")

  test("telematics: unix-ms conversion, POSITION split, alarm default") {
    val t = Cleaning.cleanTelematics(rawTelematics).orderBy("event_time").collect()
    // 1597603202000 ms -> 2020-08-16T18:40:02Z (second resolution, UTC)
    assert(t(0).getAs[java.sql.Timestamp]("event_time").getTime == 1597603202000L)
    assert(t(0).getAs[Double]("latitude_or_value") == 86.0) // scalar value branch
    assert(t(1).getAs[Double]("latitude_or_value") == 13.330059)
    assert(t(1).getAs[Double]("longitude") == 74.74467)
    assert(t(1).getAs[Double]("altitude") == -12.0)
    assert(t(1).getAs[Int]("alarmClass") == -1) // null -> -1
  }

  test("dim_policy: dense surrogate keys 1..N ordered by natural key") {
    val dp = Dimensions.dimPolicy(contracts).orderBy("policy_key").collect()
    assert(dp.map(_.getAs[Int]("policy_key")).toSeq == Seq(1, 2, 3))
    assert(dp.head.getAs[String]("contract_id") == "CTR_000001")
  }

  test("dim_date: full year count and quarter arithmetic") {
    val dd = Dimensions.dimDate(spark, "2020-01-01", "2020-12-31")
    assert(dd.count() == 366) // leap year
    val q = dd.filter($"month" === 12).select("quarter").distinct().as[Int].head()
    assert(q == 4)
  }

  test("fact assembly: policy snapshot joins all three dims; claims join on natural key") {
    val dimC = Dimensions.dimCustomer(contracts)
    val dimP = Dimensions.dimPolicy(contracts)
    val dimD = Dimensions.dimDate(spark, "2023-01-01", "2026-12-31")
    val fact = Facts.factPolicySnapshot(contracts, dimC, dimP, dimD)
    assert(fact.count() == 3)
    assert(fact.agg(sum($"premium_amount")).head().getDouble(0) == 1974.98 + 620.93)

    val claims = Cleaning.cleanClaims(Seq(
      ("CLM_1", "CTR_000001", "26-11-2023", "2023-10-02", "Theft",
        "100.00€", "50.00€", "Closed", "EXP_1", "Insured"))
      .toDF("claim_id", "contract_id", "occurrence_date", "declaration_date", "claim_type",
        "damage_amount", "indemnified_amount", "status", "expert_id", "liability"))
    val fc = Facts.factClaims(claims, dimP, dimD)
    assert(fc.count() == 1) // string natural key matches (reference's int==string join never would)
    val r = fc.head()
    assert(r.getAs[java.math.BigDecimal]("claim_amount").doubleValue() == 100.0)
    assert(r.getAs[Int]("policy_key") == 1)
    // strictCompat replays the reference's contract_id === policy_key
    // join verbatim: against a true integer surrogate the string
    // contract id matches nothing — the latent bug, made visible on
    // demand for migration comparison runs
    assert(Facts.factClaims(claims, dimP, dimD, strictCompat = true).count() == 0)
  }

  test("schema check reports missing and unexpected columns") {
    val (missing, extra) = Validation.schemaCheck(
      contracts, Seq("contract_id", "annual_premium", "not_a_column"))
    assert(missing == Seq("not_a_column"))
    assert(extra.contains("first_name") && !extra.contains("contract_id"))
  }

  test("SCD2 merge: changed keys close + reopen, new keys insert, unchanged pass") {
    val current = Seq(
      ("CLI_1", "Paris", Date.valueOf("2024-01-01"), null.asInstanceOf[Date]),  // will change
      ("CLI_2", "Lyon", Date.valueOf("2024-01-01"), null.asInstanceOf[Date]),   // unchanged
      ("CLI_1", "Nice", Date.valueOf("2023-01-01"), Date.valueOf("2024-01-01")) // history
    ).toDF("customer_key", "city", "valid_from", "valid_to")
    val updates = Seq(
      ("CLI_1", "Marseille", Date.valueOf("2024-06-01")), // changed city
      ("CLI_2", "Lyon", Date.valueOf("2024-06-01")),      // no change
      ("CLI_3", "Toulouse", Date.valueOf("2024-06-01")))  // brand new
      .toDF("customer_key", "city", "change_date")
    val merged = Dimensions.scd2Merge(current, updates, "customer_key",
      Seq("city"), "change_date").orderBy("customer_key", "valid_from").collect()
    assert(merged.length == 5)
    val cli1 = merged.filter(_.getString(0) == "CLI_1")
    assert(cli1.map(r => (r.getString(1), r.getDate(3) == null)).toSeq ==
      Seq(("Nice", false), ("Paris", false), ("Marseille", true)))
    assert(cli1(1).getDate(3) == Date.valueOf("2024-06-01")) // Paris closed at change date
    val cli2 = merged.filter(_.getString(0) == "CLI_2")
    assert(cli2.length == 1 && cli2.head.getDate(3) == null) // untouched, still open
    val cli3 = merged.filter(_.getString(0) == "CLI_3")
    assert(cli3.length == 1 && cli3.head.getDate(2) == Date.valueOf("2024-06-01"))
  }

  test("risk: speeds from consecutive GPS fixes, score formula, bands") {
    // Two fixes 60s apart, ~1.112 km apart (0.01 deg lat) -> ~66.7 km/h
    val tele = Seq(
      ("dev1", 1.6e12, "t0", "45.00,7.00,0.0", "POSITION", 0L.asInstanceOf[java.lang.Long]),
      ("dev1", 1.6e12 + 60000, "t1", "45.01,7.00,0.0", "POSITION", 0L.asInstanceOf[java.lang.Long]))
      .toDF("deviceId", "timeMili", "timestamp", "value", "variable", "alarmClass")
    val speeds = Risk.deviceSpeeds(Cleaning.cleanTelematics(tele))
    val s = speeds.select("speed_kmh").as[Double].head()
    assert(math.abs(s - 66.7) < 0.3, s"got $s")

    // Score formula on crafted speed rows: 2 speeding incidents, avg 100
    // -> 100 - 2*5 - 100/20 = 85 -> SAFE
    val crafted = Seq(
      ("devA", java.sql.Timestamp.valueOf("2020-01-01 00:00:01"), 120.0),
      ("devA", java.sql.Timestamp.valueOf("2020-01-01 00:00:02"), 120.0),
      ("devA", java.sql.Timestamp.valueOf("2020-01-01 00:00:03"), 80.0),
      ("devA", java.sql.Timestamp.valueOf("2020-01-01 00:00:04"), 80.0),
      // devB: 20 speeding at avg 159.0 -> 100 - 100 - 7.95 < 0 -> clamped 0
      // -> VERY_RISKY
    ) ++ (1 to 20).map(i =>
      ("devB", java.sql.Timestamp.valueOf(s"2020-01-01 00:01:${i % 60}"), 159.0))
    val scored = Risk.riskScores(
        crafted.toDF("deviceId", "event_time", "speed_kmh"))
      .orderBy("deviceId").collect()
    assert(scored(0).getAs[Double]("driver_risk_score") == 85.0)
    assert(scored(0).getAs[String]("risk_category") == "SAFE")
    assert(scored(1).getAs[Double]("driver_risk_score") == 0.0)
    assert(scored(1).getAs[String]("risk_category") == "VERY_RISKY")
  }

  test("multi-source ingest: one corrupt source is isolated, the rest load") {
    import graft.sources.Ingest
    // "claims" is corrupt: header lacks every column cleanClaims projects,
    // so its cleaning projection fails analysis — exactly the reference's
    // per-source try/except path (scripts/03:44-51,306-316).
    val corrupt = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$corrupt/claims.csv"), "a,b\n1,2\n")
    val loaded = Ingest.loadIsolated(
      "contracts" -> (() => Cleaning.cleanContracts(rawContracts)),
      "claims" -> (() => Cleaning.cleanClaims(
        Ingest.csvInferred(spark, s"$corrupt/claims.csv"))),
      "missing" -> (() => Ingest.parquet(spark, s"$corrupt/does_not_exist.parquet")))
    assert(loaded.ok.keySet == Set("contracts"), s"failed=${loaded.failed}")
    assert(loaded.failed.keySet == Set("claims", "missing"))
    assert(loaded.tally == "1/3 sources loaded")
    // The surviving source is fully usable downstream.
    assert(loaded("contracts").get.count() == 3)
    assert(loaded("claims").isEmpty)
  }
}
