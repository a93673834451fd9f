package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Advanced relational surface beyond the reference's inventory: as-of
  * join, full window-frame family, list aggregation, CUBE, PIVOT.
  *
  * The as-of join deserves a note: Spark has no native as-of operator.
  * The naive form (inequality join + top-1 per left row) is O(pairs) and
  * dies at scale. Two linear implementations are registered against the
  * SAME oracle: q43, the union-marker pattern (tag both sides, union,
  * ONE window pass per key ordered by time — composes entirely from
  * built-ins), and q43b, the native `plans.AsOfJoin` exec (both sides
  * shuffle once on the key, then a per-partition O(n+m) streaming merge
  * with one buffered row — no union materialization and no window
  * buffering at all). The custom exec exists because the union pass
  * sorts PURCHASES AND ERRORS TOGETHER through one window; the merge
  * sorts each side separately and never materializes their union.
  */
object Advanced {

  /** As-of join via union-marker: for each 'purchase' event, the most
    * recent 'error' event of the same user at-or-before it.
    */
  val asofJoin = Q(
    "q43_asof_join",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us,
      |    CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS tag
      |  FROM events WHERE event_type IN ('error', 'purchase')),
      |w AS (
      |  SELECT user_id, event_id, ts_us, tag,
      |    last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_id,
      |    last_value(CASE WHEN tag = 0 THEN ts_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_us
      |  FROM e)
      |SELECT user_id, event_id AS purchase_id, asof_error_id,
      |  ROUND((ts_us - asof_error_us) / 1000000.0, 6) AS gap_sec
      |FROM w WHERE tag = 1
      |ORDER BY user_id, purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val e = ev
      .filter(col("event_type").isin("error", "purchase"))
      .select(col("user_id"), col("event_id"), Tables.tsUs(ev).as("ts_us"),
        when(col("event_type") === "error", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("asof_error_id",
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("asof_error_us",
        last(when(col("tag") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("asof_error_id"),
        round((col("ts_us") - col("asof_error_us")) / 1000000.0, 6).as("gap_sec"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** Native as-of join (see object scaladoc): same semantics and oracle
    * as q43, via `plans.AsOfJoin`'s streaming-merge exec. The right side
    * carries the event_id tie-break so equal-(user, ts) errors resolve
    * to the max event_id — exactly the oracle window's last_value order.
    */
  val nativeAsof = Q(
    "q43b_native_asof",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS ts_us,
      |    CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS tag
      |  FROM events WHERE event_type IN ('error', 'purchase')),
      |w AS (
      |  SELECT user_id, event_id, ts_us, tag,
      |    last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_id,
      |    last_value(CASE WHEN tag = 0 THEN ts_us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, tag, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_us
      |  FROM e)
      |SELECT user_id, event_id AS purchase_id, asof_error_id,
      |  ROUND((ts_us - asof_error_us) / 1000000.0, 6) AS gap_sec
      |FROM w WHERE tag = 1
      |ORDER BY user_id, purchase_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val e = ev
      .filter(col("event_type").isin("error", "purchase"))
      .select(col("user_id"), col("event_id"), Tables.tsUs(ev).as("ts_us"),
        col("event_type"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("asof_error_id"),
        col("ts_us").as("asof_error_us"))
    graft.plans.AsOf.join(purchases, errors,
        leftKey = "user_id", rightKey = "e_user",
        leftTsCol = "ts_us", rightTsCol = "asof_error_us",
        rightTieBreaks = Seq("asof_error_id"))
      .select(col("user_id"), col("purchase_id"), col("asof_error_id"),
        round((col("ts_us") - col("asof_error_us")) / 1000000.0, 6).as("gap_sec"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** Window-frame family: lead, ntile, running sum (ROWS unbounded..current),
    * 3-row moving average. Window sums go through decimal so sliding-frame
    * accumulation order can't produce float drift between engines.
    */
  val windowFrames = Q(
    "q44_window_frames",
    """SELECT user_id, event_id,
      |  lead(event_id) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id) AS next_event_id,
      |  CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id) AS INTEGER) AS quartile,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |    OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
      |  (2 * SUM(CAST(ROUND(value * 100) AS BIGINT))
      |    OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 10000
      |   + COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
      |  // (2 * COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000, event_id
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) / 1000000.0 AS moving_avg3
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = ord.rowsBetween(-2, Window.currentRow)
    val ev = Tables.events(s, d)
    ev.select(col("user_id"), col("event_id"), col("value"), Tables.tsUs(ev).as("ts_us"))
      .select(col("user_id"), col("event_id"),
        lead(col("event_id"), 1).over(ord).as("next_event_id"),
        ntile(4).over(ord).as("quartile"),
        sum(col("value").cast("decimal(18,2)")).over(cum).cast("double").as("running_value"),
        sum(round(col("value") * 100).cast("long")).over(mov).as("mov_cents"),
        count(lit(1)).over(mov).as("mov_n"))
      .select(col("user_id"), col("event_id"), col("next_event_id"), col("quartile"),
        col("running_value"),
        (Det.halfUpDiv(col("mov_cents") * 10000, col("mov_n")) / 1000000.0)
          .as("moving_avg3"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** List aggregation: ordered collect_list / collect_set rendered as
    * strings (deterministic via explicit sorting).
    */
  val collectList = Q(
    "q45_collect_list",
    """SELECT user_id,
      |  array_to_string(list_sort(list(event_type)), ',') AS all_types,
      |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS distinct_types,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("event_type")))).as("all_types"),
        concat_ws(",", sort_array(collect_set(col("event_type")))).as("distinct_types"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))
  }

  /** CUBE over two dimensions with grouping indicator. */
  val cubeAgg = Q(
    "q46_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("revenue"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n_orders"), col("revenue"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** PIVOT: order revenue by status × priority, explicit value list (the
    * oracle expresses the same as conditional aggregation — identical
    * semantics, fixed output schema).
    */
  val pivotAgg = Q(
    "q47_pivot",
    """SELECT o_orderstatus,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p1_urgent,
      |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p3_medium,
      |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p5_low
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Seq("1-URGENT", "3-MEDIUM", "5-LOW"))
      .agg(Det.dsum(col("o_totalprice")))
      .withColumnRenamed("1-URGENT", "p1_urgent")
      .withColumnRenamed("3-MEDIUM", "p3_medium")
      .withColumnRenamed("5-LOW", "p5_low")
      .orderBy(col("o_orderstatus"))
  }

  val specs: Seq[Q] =
    Seq(asofJoin, nativeAsof, windowFrames, collectList, cubeAgg, pivotAgg)
}
