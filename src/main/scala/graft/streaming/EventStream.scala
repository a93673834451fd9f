package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference processes its telematics
  * stream as a batch snapshot (scripts/01:28-29 — "very large batch
  * snapshot of historical stream"); this module is the native streaming
  * expression of the same computations, per SURVEY §2.9's extension note:
  * event-time windowed aggregation with watermarking, and per-key custom
  * state via mapGroupsWithState.
  *
  * Every transform here takes a DataFrame that may be either a batch or a
  * `readStream` source — the plans are identical, which is exactly the
  * Structured Streaming model (incrementalized batch plan).
  */
object EventStream {

  /** Event-time tumbling-window aggregation with late-data bound.
    * Input schema: (event_ts: timestamp, event_type: string, value: double).
    */
  def windowedCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
      windowLength: String = "5 minutes"): DataFrame =
    events
      .withWatermark("event_ts", watermarkDelay)
      .groupBy(window(col("event_ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  case class UserEvent(user_id: Long, value: Double)
  case class UserState(n: Long, maxValue: Double)
  case class UserUpdate(user_id: Long, n: Long, maxValue: Double)

  /** Per-key arbitrary stateful processing (the reference's per-device
    * tracking as a live stream): running event count + max value per user
    * via mapGroupsWithState.
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, Double.MinValue))
          val next = rows.foldLeft(prev) { (st, e) =>
            UserState(st.n + 1, math.max(st.maxValue, e.value))
          }
          state.update(next)
          UserUpdate(userId, next.n, next.maxValue)
      }
  }

  /** Drive a streaming DataFrame into an in-memory table and block until
    * all available input is processed — the synchronous harness used by
    * tests (and handy for local smoke runs).
    */
  def runToMemory(stream: DataFrame, queryName: String, outputMode: OutputMode): Unit = {
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
