package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The same stateful streaming ops on the RocksDB state store provider —
  * the 100 TB configuration, where per-key state lives off-heap/on-disk
  * instead of in executor heap (HDFSBackedStateStore's ceiling). Results
  * must be identical to the default provider; only the store changes.
  */
class RocksDBStateSpec extends SparkSuite {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDB[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("windowed aggregation state lives in RocksDB; counts identical") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Timestamp, String, Double)]
      val stream = EventStream.windowedCounts(
        input.toDF().toDF("event_ts", "event_type", "value"))
      val q = stream.writeStream.format("memory").queryName("rocks_win")
        .outputMode("update").start()
      try {
        input.addData(
          (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
          (Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
          (Timestamp.valueOf("2024-01-01 00:07:00"), "view", 5.0))
        q.processAllAvailable()
        // second batch updates existing window state across store commits
        input.addData((Timestamp.valueOf("2024-01-01 00:03:00"), "click", 4.0))
        q.processAllAvailable()
        val rows = spark.table("rocks_win")
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"), max(col("sum_value")).as("s"))
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        assert(rows("click") == ((3L, 7.0)), s"got $rows")
        assert(rows("view") == ((1L, 5.0)), s"got $rows")
        // the state store in use really is RocksDB, not silently defaulted
        assert(q.lastProgress.stateOperators.nonEmpty)
        val mem = q.lastProgress.stateOperators(0).customMetrics
        assert(mem.containsKey("rocksdbGetCount"), s"not RocksDB: $mem")
      } finally q.stop()
    }
  }

  test("transformWithState (Spark 4 API) matches the mapGroupsWithState results") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventStream.UserEvent]
      val stream = EventStream.runningUserStatsTws(input.toDS())
      val q = stream.toDF().writeStream.format("memory").queryName("rocks_tws")
        .outputMode("update").start()
      try {
        input.addData(EventStream.UserEvent(1L, 10.0), EventStream.UserEvent(1L, 20.0))
        q.processAllAvailable()
        input.addData(EventStream.UserEvent(1L, 5.0), EventStream.UserEvent(2L, 7.0))
        q.processAllAvailable()
        val last = spark.table("rocks_tws")
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n"), max(col("maxValue")).as("mx"))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        // identical to the mapGroupsWithState expectation below
        assert(last(1L) == ((3L, 20.0)), s"got $last")
        assert(last(2L) == ((1L, 7.0)), s"got $last")
      } finally q.stop()
    }
  }

  test("mapGroupsWithState per-key state on RocksDB; running stats identical") {
    withRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventStream.UserEvent]
      val stream = EventStream.runningUserStats(input.toDS())
      val q = stream.toDF().writeStream.format("memory").queryName("rocks_state")
        .outputMode("update").start()
      try {
        input.addData(EventStream.UserEvent(1L, 10.0), EventStream.UserEvent(1L, 20.0))
        q.processAllAvailable()
        input.addData(EventStream.UserEvent(1L, 5.0), EventStream.UserEvent(2L, 7.0))
        q.processAllAvailable()
        val last = spark.table("rocks_state")
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n"), max(col("maxValue")).as("mx"))
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
        assert(last(1L) == ((3L, 20.0)), s"got $last") // state carried across batches
        assert(last(2L) == ((1L, 7.0)), s"got $last")
      } finally q.stop()
    }
  }
}
