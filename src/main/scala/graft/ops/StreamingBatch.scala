package graft.ops

import graft.{Det, Q, Tables}
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** The streaming module's transforms run on batch frames — Structured
  * Streaming's model is an incrementalized batch plan, so
  * `EventStream.windowedCounts` is ONE definition serving both: here it
  * runs in batch against the oracle; `StreamingSpec` drives the same
  * function over a MemoryStream with watermarks and state.
  */
object StreamingBatch {

  /** 5-minute tumbling event-time windows per event_type, computed by the
    * streaming transform in batch mode.
    */
  val eventWindows = Q(
    "q54_event_windows",
    """SELECT make_timestamp((epoch_ns(ts)//1000) // 300000000 * 300000000) AS window_start,
      |  event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
      .select(timestamp_micros(expr("ts DIV 1000")).as("event_ts"),
        col("event_type"), col("value").cast("decimal(18,2)").as("value"))
    EventStream.windowedCounts(events, watermarkDelay = "10 minutes",
        windowLength = "5 minutes")
      .select(col("window_start"), col("event_type"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val specs: Seq[Q] = Seq(eventWindows)
}
