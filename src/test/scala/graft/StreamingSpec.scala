package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.{UserEvent, UserUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("windowed event-time aggregation over a memory stream") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = EventStream.windowedCounts(
      input.toDF().toDF("event_ts", "event_type", "value"),
      watermarkDelay = "1 minute", windowLength = "5 minutes")
    input.addData(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 00:06:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 00:03:00"), "view", 8.0))
    EventStream.runToMemory(stream, "windowed_counts", OutputMode.Update)
    val rows = spark.table("windowed_counts")
      .select("window_start", "event_type", "n", "sum_value")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 00:05:00.0", "click", 1L, 4.0)))
    assert(rows.contains(("2024-01-01 00:00:00.0", "view", 1L, 8.0)))
  }

  test("streaming dedup drops replayed events across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventStream.dedupStream(
      input.toDF().toDF("event_id", "event_ts", "payload"), "event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("deduped").outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, Timestamp.valueOf("2024-01-01 00:01:00"), "a"),
        (2L, Timestamp.valueOf("2024-01-01 00:01:30"), "b"))
      q.processAllAvailable()
      // at-least-once source replays event 1 — with a DIFFERENT event_ts,
      // as real replays may; by-id dedup must still drop it. Event 3 is new.
      input.addData((1L, Timestamp.valueOf("2024-01-01 00:01:05"), "a"),
        (3L, Timestamp.valueOf("2024-01-01 00:02:00"), "c"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("deduped").select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")
  }

  test("stream-static enrichment joins the dimension per micro-batch") {
    implicit val sc = spark.sqlContext
    val dim = Seq(("dev1", "CLI_1"), ("dev2", "CLI_2")).toDF("deviceId", "customer_id")
    val input = MemoryStream[(String, Double)]
    val enriched = EventStream.enrich(
      input.toDF().toDF("deviceId", "value"), dim, "deviceId")
    val q = enriched.writeStream.format("memory")
      .queryName("enriched").outputMode(OutputMode.Append).start()
    try {
      input.addData(("dev1", 1.0), ("dev9", 2.0)) // dev9 unknown -> null customer
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("enriched")
      .collect().map(r => (r.getString(0), Option(r.getString(2)))).toSet
    assert(rows == Set(("dev1", Some("CLI_1")), ("dev9", None)))
  }

  test("live speed tracking carries GPS state across micro-batches") {
    import graft.streaming.EventStream.{GpsFix, SpeedUpdate}
    implicit val sc = spark.sqlContext
    val input = MemoryStream[GpsFix]
    val q = EventStream.liveSpeedTracking(input.toDS())
      .writeStream.format("memory").queryName("speeds")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: two fixes 60s apart, 0.01 deg lat (~1.112 km) -> ~66.7 km/h
      input.addData(GpsFix("dev1", 1000L, 45.00, 7.00), GpsFix("dev1", 1060L, 45.01, 7.00))
      q.processAllAvailable()
      // batch 2: state must remember the last fix: another 0.02 deg in 60s -> ~133 km/h
      input.addData(GpsFix("dev1", 1120L, 45.03, 7.00))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("speeds").as[SpeedUpdate].collect().maxBy(_.n_fixes)
    assert(last.n_fixes == 3L)
    assert(math.abs(last.max_speed_kmh - 133.4) < 1.0, s"got ${last.max_speed_kmh}")
  }

  test("per-user running state via mapGroupsWithState across two batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val updates = EventStream.runningUserStats(input.toDS())
    val q = updates.writeStream.format("memory")
      .queryName("user_stats").outputMode(OutputMode.Update).start()
    try {
      input.addData(UserEvent(1L, 10.0), UserEvent(1L, 5.0), UserEvent(2L, 7.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, 99.0)) // state must carry across batches
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("user_stats").as[UserUpdate].collect()
      .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n) }
    assert(last(1L) == UserUpdate(1L, 3L, 99.0))
    assert(last(2L) == UserUpdate(2L, 1L, 7.0))
  }
}
