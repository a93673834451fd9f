package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream: weekly cohort
  * retention and ordered funnel conversion — the canonical "is this an
  * analytics engine" queries. All arithmetic is integer (epoch days/
  * weeks, distinct-user counts), so cross-engine agreement is exact.
  */
object ProductAnalytics {

  /** Weekly cohort retention: users grouped by first-seen week, counted
    * in each subsequent week they were active.
    */
  val retention = Q(
    "q63_retention",
    """WITH e AS (
      |  SELECT user_id, (epoch_ns(ts)//1000) // 86400000000 // 7 AS week
      |  FROM events),
      |first_seen AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id),
      |active AS (SELECT DISTINCT user_id, week FROM e)
      |SELECT f.cohort_week,
      |  CAST(a.week - f.cohort_week AS BIGINT) AS week_offset,
      |  COUNT(DISTINCT a.user_id) AS n_active
      |FROM active a JOIN first_seen f ON a.user_id = f.user_id
      |GROUP BY f.cohort_week, a.week - f.cohort_week
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val e = ev
      .select(col("user_id"), Tables.tsUs(ev).as("ts_us"))
      .select(col("user_id"), expr("ts_us DIV 86400000000 DIV 7").as("week"))
    // cohort weeks derive from the DISTINCT activity table (min over
    // distinct weeks ≡ min over all events). Catalyst then ELIMINATES
    // the dedup under the min-aggregate, so the cohort branch shuffles
    // the raw stream with a map-side partial min — the optimal shape;
    // writing it this way documents the equivalence without forcing
    // either physical form.
    val active = e.distinct()
    val firstSeen = active.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    active.join(firstSeen, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Ordered funnel: signup → first click after signup → first purchase
    * after that click; per-stage user counts.
    */
  val funnel = Q(
    "q64_funnel",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts)//1000 AS ts_us FROM events),
      |s1 AS (
      |  SELECT user_id, MIN(ts_us) AS t1 FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts_us) AS t2
      |  FROM e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts_us > s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts_us) AS t3
      |  FROM e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
      |  GROUP BY e.user_id)
      |SELECT 'stage1_signup' AS stage, COUNT(*) AS n_users FROM s1
      |UNION ALL SELECT 'stage2_click', COUNT(*) FROM s2
      |UNION ALL SELECT 'stage3_purchase', COUNT(*) FROM s3
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val e = ev
      .select(col("user_id"), col("event_type"), Tables.tsUs(ev).as("ts_us"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts_us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts_us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    def stage(name: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage("stage1_signup", s1)
      .unionByName(stage("stage2_click", s2))
      .unionByName(stage("stage3_purchase", s3))
      .orderBy(col("stage"))
  }

  val specs: Seq[Q] = Seq(retention, funnel)
}
