package graft.ops

import graft.{Det, Q, Tables}
import graft.functions.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream (time-series-in-batch) family — the reference's telematics
  * processing (scripts/08_load_driver_risk_scores.py) generalized to the
  * harness `events` table: per-key `lag` windows (08:208-214), epoch
  * deltas (08:218-221), Haversine distance/speed (08:55-80, 08:225-248),
  * grouped risk features + score banding (08:261-285), plus gap-based
  * sessionization and JSON property extraction (engine extensions).
  *
  * Event-time handling: the testdata `ts` column's parquet physical type
  * has varied across harness regenerations (TIMESTAMP(NANOS) read as an
  * epoch-nano long, TIMESTAMP(MICROS) read as a timestamp). Both engines
  * reduce it to epoch-MICROseconds exactly — Spark via the dtype-adaptive
  * `Tables.tsUs`, DuckDB via `epoch_ns(ts)//1000` (integer arithmetic;
  * double division would lose precision at 1e18).
  *
  * Scale notes: every window here partitions by `user_id` (high
  * cardinality), unlike the reference's 3-device skew hazard (SURVEY §7).
  * The window shuffle partitioning (hash on user_id) is REUSED by the
  * subsequent groupBy(user_id) — Catalyst elides the second exchange.
  */
object Events {

  /** Canonical event projection: microsecond event time + ms variant. */
  private def base(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.select(
      col("user_id"), col("event_id"), col("event_type"), col("value"), col("props"),
      Tables.tsUs(ev).as("ts_us"))
  }

  private val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))

  /** Per-key lag + epoch delta (W2 + F15, reference 08:208-221). */
  val windowLag = Q(
    "q17_window_lag",
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us FROM events)
      |SELECT user_id, event_id,
      |  make_timestamp(ts_us) AS event_ts,
      |  ts_us // 1000 AS ts_ms,
      |  ROUND((ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)) / 1000000.0, 6) AS dt_sec
      |FROM e
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    base(s, d)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .select(
        col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("event_ts"),
        expr("ts_us DIV 1000").as("ts_ms"),
        round((col("ts_us") - col("prev_us")) / 1000000.0, 6).as("dt_sec"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Top-k per group via ranked window (top-3 orders per customer). */
  val topkPerGroup = Q(
    "q18_topk_per_group",
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val wk = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(wk))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Full telematics risk pipeline (reference 08 end-to-end): synthetic
    * GPS from `value`, lag window → time delta → Haversine → speed →
    * threshold filter → grouped risk features → score + band.
    * Speeds are summed as round-then-decimal (`Det.rsum`) so the grouped
    * averages are bit-deterministic across partition orders.
    */
  val riskScores = Q(
    "q26_risk_scores",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us,
      |    40.0 + value / 1000.0 AS lat, 3.0 + value / 500.0 AS lon
      |  FROM events),
      |lagged AS (
      |  SELECT user_id, ts_us, lat, lon,
      |    lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us,
      |    lag(lat)  OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_lat,
      |    lag(lon)  OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_lon
      |  FROM e),
      |moves AS (
      |  SELECT user_id, (ts_us - prev_us) / 1000000.0 AS dt_sec,
      |    2 * 6371.0 * atan2(
      |      sqrt(pow(sin(radians(lat - prev_lat) / 2), 2)
      |        + cos(radians(prev_lat)) * cos(radians(lat))
      |        * pow(sin(radians(lon - prev_lon) / 2), 2)),
      |      sqrt(1.0 - (pow(sin(radians(lat - prev_lat) / 2), 2)
      |        + cos(radians(prev_lat)) * cos(radians(lat))
      |        * pow(sin(radians(lon - prev_lon) / 2), 2)))) AS dist_km
      |  FROM lagged WHERE prev_us IS NOT NULL AND ts_us - prev_us > 0),
      |speeds AS (
      |  SELECT user_id, dist_km / (dt_sec / 3600.0) AS speed_kmh
      |  FROM moves),
      |feats AS (
      |  SELECT user_id,
      |    COUNT(*) AS n_moves,
      |    COUNT(CASE WHEN speed_kmh > 60 THEN 1 END) AS speeding,
      |    (2 * SUM(CAST(ROUND(speed_kmh * 1000000) AS BIGINT)) + COUNT(*) * 100)
      |      // (2 * COUNT(*) * 100) / 10000.0 AS avg_speed,
      |    ROUND(MAX(speed_kmh), 4) AS max_speed
      |  FROM speeds WHERE speed_kmh < 160 GROUP BY user_id)
      |SELECT user_id, n_moves, speeding, avg_speed, max_speed,
      |  GREATEST(0.0, 100.0 - 2.0 * speeding
      |    - CASE WHEN avg_speed > 50 THEN 10.0 ELSE 0.0 END
      |    - CASE WHEN max_speed > 100 THEN 15.0 ELSE 0.0 END) AS risk_score,
      |  CASE WHEN GREATEST(0.0, 100.0 - 2.0 * speeding
      |         - CASE WHEN avg_speed > 50 THEN 10.0 ELSE 0.0 END
      |         - CASE WHEN max_speed > 100 THEN 15.0 ELSE 0.0 END) >= 80 THEN 'SAFE'
      |       WHEN GREATEST(0.0, 100.0 - 2.0 * speeding
      |         - CASE WHEN avg_speed > 50 THEN 10.0 ELSE 0.0 END
      |         - CASE WHEN max_speed > 100 THEN 15.0 ELSE 0.0 END) >= 60 THEN 'MODERATE'
      |       WHEN GREATEST(0.0, 100.0 - 2.0 * speeding
      |         - CASE WHEN avg_speed > 50 THEN 10.0 ELSE 0.0 END
      |         - CASE WHEN max_speed > 100 THEN 15.0 ELSE 0.0 END) >= 40 THEN 'RISKY'
      |       ELSE 'VERY_RISKY' END AS risk_band
      |FROM feats
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val e = base(s, d)
      .withColumn("lat", lit(40.0) + col("value") / 1000.0)
      .withColumn("lon", lit(3.0) + col("value") / 500.0)
    val lagged = e.select(col("user_id"), col("ts_us"), col("lat"), col("lon"),
      lag(col("ts_us"), 1).over(w).as("prev_us"),
      lag(col("lat"), 1).over(w).as("prev_lat"),
      lag(col("lon"), 1).over(w).as("prev_lon"))
    val moves = lagged
      .filter(col("prev_us").isNotNull && (col("ts_us") - col("prev_us")) > 0)
      .withColumn("dt_sec", (col("ts_us") - col("prev_us")) / 1000000.0)
      .withColumn("dist_km",
        Geo.haversineKm(col("prev_lat"), col("prev_lon"), col("lat"), col("lon")))
    val speeds = moves
      .withColumn("speed_kmh", col("dist_km") / (col("dt_sec") / 3600.0))
      .filter(col("speed_kmh") < 160)
    val feats = speeds.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_moves"),
      count(when(col("speed_kmh") > 60, 1)).as("speeding"),
      sum(round(col("speed_kmh") * 1000000).cast("long")).as("speed_micro"),
      round(max(col("speed_kmh")), 4).as("max_speed"))
      .withColumn("avg_speed",
        Det.halfUpDiv(col("speed_micro"), col("n_moves") * 100) / 10000.0)
      .drop("speed_micro")
    val score = greatest(lit(0.0),
      lit(100.0) - lit(2.0) * col("speeding")
        - when(col("avg_speed") > 50, 10.0).otherwise(0.0)
        - when(col("max_speed") > 100, 15.0).otherwise(0.0))
    feats
      .withColumn("risk_score", score)
      .withColumn("risk_band",
        when(col("risk_score") >= 80, "SAFE")
          .when(col("risk_score") >= 60, "MODERATE")
          .when(col("risk_score") >= 40, "RISKY")
          .otherwise("VERY_RISKY"))
      .orderBy(col("user_id"))
  }

  /** Gap-based sessionization: 30-min inactivity closes a session;
    * session ids via windowed cumulative sum, then per-user session stats.
    */
  val sessionize = Q(
    "q27_sessionize",
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, event_id,
      |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
      |           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM e),
      |sessions AS (
      |  SELECT user_id, ts_us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM flagged),
      |per_sess AS (
      |  SELECT user_id, sess_id, COUNT(*) AS n_events,
      |    ROUND((MAX(ts_us) - MIN(ts_us)) / 1000000.0, 6) AS duration_sec
      |  FROM sessions GROUP BY user_id, sess_id)
      |SELECT user_id,
      |  COUNT(*) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS total_events,
      |  (2 * SUM(n_events) * 10000 + COUNT(*)) // (2 * COUNT(*)) / 10000.0 AS avg_session_events,
      |  MAX(duration_sec) AS max_session_sec
      |FROM per_sess
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val flagged = base(s, d).select(col("user_id"), col("ts_us"), col("event_id"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
    // event_id tie-break: duplicate timestamps otherwise make the running
    // sum (and thus session assignment) order-dependent across engines.
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = flagged.withColumn("sess_id", sum(col("new_sess")).over(cum))
    val perSess = sessions.groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        round((max(col("ts_us")) - min(col("ts_us"))) / 1000000.0, 6).as("duration_sec"))
    perSess.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        max(col("duration_sec")).as("max_session_sec"))
      .withColumn("avg_session_events",
        Det.halfUpDiv(col("total_events") * 10000, col("n_sessions")) / 10000.0)
      .orderBy(col("user_id"))
  }

  /** JSON property extraction (`from_json`) + grouped integer stats.
    * The oracle extracts with a regexp — same values, no JSON extension
    * dependency in the comparator.
    */
  val jsonExtract = Q(
    "q28_json_extract",
    """WITH e AS (
      |  SELECT event_type, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k
      |  FROM events)
      |SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      |FROM e
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val specs: Seq[Q] = Seq(windowLag, topkPerGroup, riskScores, sessionize, jsonExtract)
}
