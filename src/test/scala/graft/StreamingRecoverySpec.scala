package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Crash-restart semantics of the checkpointed sinks: the offset log +
  * file-sink manifest must deliver every input row exactly once across a
  * stop/restart boundary, and foreachBatch must resume after the last
  * committed batch id instead of replaying it.
  */
class StreamingRecoverySpec extends SparkSuite {
  import spark.implicits._

  test("parquet sink + checkpoint: stop/restart loses nothing, duplicates nothing") {
    val base = Files.createTempDirectory("graft_recovery").toString
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("id", "value")
      .select(col("id"), col("value"), (col("value") * 2).as("doubled"))

    val q1 = EventStream.toParquetSink(stream, out, ckpt)
    input.addData((1L, 1.0), (2L, 2.0))
    q1.processAllAvailable()
    q1.stop()

    // data arriving while the query is down
    input.addData((3L, 3.0))

    val q2 = EventStream.toParquetSink(stream, out, ckpt)
    input.addData((4L, 4.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 1.0, 2.0), (2L, 2.0, 4.0), (3L, 3.0, 6.0), (4L, 4.0, 8.0)),
      s"exactly-once violated: $rows")
  }

  test("foreachBatch: restart resumes after the last committed batch id") {
    val base = Files.createTempDirectory("graft_recovery_fb").toString
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val stream = input.toDF().toDF("id")

    val q1 = EventStream.toForeachBatch(stream, s"$base/ckpt") { (batch, id) =>
      seen.put(id, batch.collect().map(_.getLong(0)).toSeq.sorted)
    }
    input.addData(1L, 2L)
    q1.processAllAvailable()
    input.addData(3L)
    q1.processAllAvailable()
    q1.stop()
    val committedIds = seen.keySet().toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet

    val q2 = EventStream.toForeachBatch(stream, s"$base/ckpt") { (batch, id) =>
      seen.put(id, batch.collect().map(_.getLong(0)).toSeq.sorted)
    }
    input.addData(4L, 5L)
    q2.processAllAvailable()
    q2.stop()

    val allIds = seen.keySet().toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
    val newIds = allIds -- committedIds
    assert(newIds.nonEmpty && newIds.forall(id => id > committedIds.max),
      s"replayed a committed batch: committed=$committedIds all=$allIds")
    val allRows = seen.values().toArray(Array.empty[Seq[Long]]).flatten.toSet
    assert(allRows == Set(1L, 2L, 3L, 4L, 5L))
  }
}
