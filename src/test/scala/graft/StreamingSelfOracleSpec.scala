package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.{UserEvent, UserUpdate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming self-oracle: every streaming transform is ONE definition
  * that also runs in batch (Structured Streaming = incrementalized batch
  * plan), so the batch execution over the full input is an oracle for
  * the incremental execution over the same input split into
  * micro-batches. These tests drive real testdata (sf0.001 events)
  * through both modes and require identical results.
  */
class StreamingSelfOracleSpec extends SparkSuite {
  import spark.implicits._

  // (event_ts, event_type, value) from the real events table, in event-time
  // order so chunked replay never crosses the watermark (batch mode has no
  // late-data drops, so ordered feed keeps the two modes comparable).
  private lazy val eventRows: Seq[(Timestamp, String, java.math.BigDecimal)] = {
    val ev = Tables.events(spark, sf0001)
    ev
      .select(timestamp_micros(Tables.tsUs(ev)).as("event_ts"),
        col("event_type"), col("value").cast("decimal(18,2)").as("value"))
      .orderBy(col("event_ts"), col("event_type"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDecimal(2)))
      .toSeq
  }

  /** Exactly `n` chunks (grouped can yield fewer for some sizes — pad with
    * empty batches so `val Seq(a,b,c) = chunks(..,3)` never MatchErrors).
    */
  private def chunks[T](xs: Seq[T], n: Int): Seq[Seq[T]] =
    xs.grouped(math.max(1, (xs.size + n - 1) / n)).toSeq.padTo(n, Seq.empty[T])

  private def canon(df: DataFrame): Seq[String] =
    df.select(col("window_start").cast("string"), col("event_type"),
        col("n").cast("string"), col("sum_value").cast("string"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("windowed aggregation: incremental over 4 micro-batches == batch") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, java.math.BigDecimal)]
    val stream = EventStream.windowedCounts(
      input.toDF().toDF("event_ts", "event_type", "value"))
    // Complete mode: the memory sink holds the full final aggregate after
    // the last trigger — directly comparable to the batch run.
    val q = stream.writeStream.format("memory")
      .queryName("self_oracle_windows").outputMode(OutputMode.Complete).start()
    try {
      chunks(eventRows, 4).foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val batch = EventStream.windowedCounts(
      eventRows.toDF("event_ts", "event_type", "value"))
    assert(canon(spark.table("self_oracle_windows")) == canon(batch))
  }

  test("streaming dedup: appended rows == batch dropDuplicates, with replays") {
    implicit val sc = spark.sqlContext
    // Real ids replayed across micro-batches with shifted timestamps (the
    // at-least-once pattern): chunk 2 re-sends half of chunk 1.
    val evB = Tables.events(spark, sf0001)
    val base = evB
      .select(col("event_id"), timestamp_micros(Tables.tsUs(evB)).as("event_ts"),
        col("event_type"))
      .orderBy(col("event_ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq
    val Seq(c1, c2, c3) = chunks(base, 3)
    val replayed = c1.takeRight(c1.size / 2)
      .map { case (id, ts, tp) => (id, new Timestamp(ts.getTime + 1000), tp) }

    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventStream.dedupStream(
      input.toDF().toDF("event_id", "event_ts", "event_type"), "event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("self_oracle_dedup").outputMode(OutputMode.Append).start()
    try {
      input.addData(c1); q.processAllAvailable()
      input.addData(replayed ++ c2); q.processAllAvailable()
      input.addData(c3); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("self_oracle_dedup")
      .select("event_id").as[Long].collect().sorted.toSeq
    val batch = base.map(_._1).distinct.sorted
    assert(streamed == batch)
    assert(streamed.size == streamed.distinct.size, "stream emitted a duplicate id")
  }

  test("session windows: incremental over 4 micro-batches == batch") {
    implicit val sc = spark.sqlContext
    val evS = Tables.events(spark, sf0001)
    val rows = evS
      .select(col("user_id"), timestamp_micros(Tables.tsUs(evS)).as("event_ts"),
        col("value").cast("decimal(18,2)").as("value"))
      .orderBy(col("event_ts"), col("user_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDecimal(2))).toSeq

    val input = MemoryStream[(Long, Timestamp, java.math.BigDecimal)]
    val stream = EventStream.sessionStats(
      input.toDF().toDF("user_id", "event_ts", "value"), gap = "4 hours")
    val q = stream.writeStream.format("memory")
      .queryName("self_oracle_sessions").outputMode(OutputMode.Complete).start()
    try {
      chunks(rows, 4).foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()

    def canonS(df: DataFrame): Seq[String] =
      df.select(col("user_id").cast("string"), col("session_start").cast("string"),
          col("session_end").cast("string"), col("n_events").cast("string"),
          col("sum_value").cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq
    val batch = EventStream.sessionStats(
      rows.toDF("user_id", "event_ts", "value"), gap = "4 hours")
    assert(canonS(spark.table("self_oracle_sessions")) == canonS(batch))
  }

  test("stream-stream interval join: incremental == batch") {
    implicit val sc = spark.sqlContext
    val evJ = Tables.events(spark, sf0001)
    val e = evJ
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(Tables.tsUs(evJ)).as("t"))
      .orderBy(col("t"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3))).toSeq
    val clickRows = e.filter(_._3 == "click").map(x => (x._2, x._1, x._4))
    val purchaseRows = e.filter(_._3 == "purchase").map(x => (x._2, x._1, x._4))

    val clickIn = MemoryStream[(Long, Long, Timestamp)]
    val purchIn = MemoryStream[(Long, Long, Timestamp)]
    def joined(c: DataFrame, p: DataFrame): DataFrame =
      EventStream.streamStreamJoin(
        c.toDF("user_id", "click_id", "click_ts"), "click_ts", "30 minutes",
        p.toDF("p_user_id", "purchase_id", "purchase_ts"), "purchase_ts", "30 minutes",
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"))
    val q = joined(clickIn.toDF(), purchIn.toDF()).writeStream.format("memory")
      .queryName("self_oracle_ssjoin").outputMode(OutputMode.Append).start()
    try {
      (chunks(clickRows, 3) zip chunks(purchaseRows, 3)).foreach { case (cc, pc) =>
        clickIn.addData(cc); purchIn.addData(pc); q.processAllAvailable()
      }
    } finally q.stop()

    def canonJ(df: DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val batch = joined(clickRows.toDF("user_id", "click_id", "click_ts"),
      purchaseRows.toDF("p_user_id", "purchase_id", "purchase_ts"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    assert(canonJ(spark.table("self_oracle_ssjoin")) == canonJ(batch))
  }

  test("stateful running stats: final state per user == batch aggregate") {
    implicit val sc = spark.sqlContext
    val userRows = Tables.events(spark, sf0001)
      .select(col("user_id"), col("value"))
      .collect().map(r => UserEvent(r.getLong(0), r.getDouble(1))).toSeq

    val input = MemoryStream[UserEvent]
    val q = EventStream.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("self_oracle_state")
      .outputMode(OutputMode.Update).start()
    try {
      chunks(userRows, 5).foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val finalPerUser = spark.table("self_oracle_state").as[UserUpdate].collect()
      .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n) }
    val batch = userRows.toDS()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("maxValue"))
      .collect()
      .map(r => r.getLong(0) -> UserUpdate(r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toMap
    assert(finalPerUser.size == batch.size)
    batch.foreach { case (uid, exp) =>
      assert(finalPerUser(uid) == exp, s"user $uid: ${finalPerUser(uid)} vs $exp")
    }
  }
}
