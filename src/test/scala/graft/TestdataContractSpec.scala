package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TESTDATA-CONTRACT CANARY (round-8 verdict item 3): the harness has
  * silently regenerated the testdata between rounds TWICE (events.ts
  * flipped parquet physical type both times), and each time the failure
  * surfaced as N scattered query errors instead of one named cause.
  * This suite pins the physical schema of every depended-on column so
  * the NEXT regeneration fails here first, with the adaptor to extend
  * named in the message.
  *
  * Scope: only properties queries/oracles actually rely on — column
  * physical types, the embedding width, and key density assumptions.
  * Data VALUES are free to change (oracle and engine read the same
  * files); shapes are not.
  */
class TestdataContractSpec extends SparkSuite {

  private def sfDirs: Seq[String] =
    Seq(sf0001, "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(new java.io.File(_).isDirectory)

  test("events.ts physical type is one Tables.tsUs adapts to") {
    for (sf <- sfDirs) {
      val df = Tables.events(spark, sf)
      val t = df.schema("ts").dataType
      assert(Set[DataType](LongType, TimestampType, TimestampNTZType)(t),
        s"$sf: events.ts reads as $t - a NEW physical type; extend " +
          "graft.Tables.tsUs (the single event-time adaptor) and its " +
          "DuckDB oracle twin epoch_ns(ts)//1000 before touching queries")
      // the rest of the row the event-time family depends on
      val want = Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType)
      want.foreach { case (c, wt) =>
        assert(df.schema(c).dataType == wt, s"$sf: events.$c is " +
          s"${df.schema(c).dataType}, queries assume $wt")
      }
    }
  }

  test("embeddings: vec_id dense from 0, embedding array<float> width 64") {
    for (sf <- sfDirs) {
      val df = Tables.embeddings(spark, sf)
      assert(df.schema("vec_id").dataType == LongType,
        s"$sf: embeddings.vec_id is ${df.schema("vec_id").dataType}")
      assert(df.schema("embedding").dataType == ArrayType(FloatType, true) ||
        df.schema("embedding").dataType == ArrayType(FloatType, false),
        s"$sf: embeddings.embedding is ${df.schema("embedding").dataType} " +
          "- the ANN family (graft_dot/graft_cosine, PQ blocks) assumes " +
          "array<float>")
      val r = df.agg(min(size(col("embedding"))).as("mn"),
        max(size(col("embedding"))).as("mx"),
        min(col("vec_id")).as("idMin"), count(lit(1)).as("n"),
        countDistinct(col("vec_id")).as("nd")).head()
      assert(r.getAs[Int]("mn") == 64 && r.getAs[Int]("mx") == 64,
        s"$sf: embedding width ${r.getAs[Int]("mn")}..${r.getAs[Int]("mx")} " +
          "- PQ sub-block slicing (Quantizer.subBlocks) assumes 64")
      // q141-auto / plane seeding assume ids are dense-ish from 0 (the
      // first-16 oracle planes ARE vec_id < 16) and unique
      assert(r.getAs[Long]("idMin") == 0L, s"$sf: vec_id starts at " +
        s"${r.getAs[Long]("idMin")}, oracle plane recipes assume 0")
      assert(r.getAs[Long]("n") == r.getAs[Long]("nd"),
        s"$sf: duplicate vec_ids")
    }
  }

  test("documents: doc_id/text/lang/source/n_chars as the text family assumes") {
    for (sf <- sfDirs) {
      val df = Tables.documents(spark, sf)
      val want = Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
      want.foreach { case (c, wt) =>
        assert(df.schema(c).dataType == wt, s"$sf: documents.$c is " +
          s"${df.schema(c).dataType}, text/dedup queries assume $wt")
      }
    }
  }

  test("lineitem/orders numeric+date columns keep their physical types") {
    for (sf <- sfDirs) {
      val li = Tables.lineitem(spark, sf)
      val wantLi = Map[String, DataType]("l_orderkey" -> LongType,
        "l_partkey" -> LongType, "l_suppkey" -> LongType,
        "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
        "l_tax" -> DoubleType, "l_returnflag" -> StringType,
        "l_linestatus" -> StringType)
      wantLi.foreach { case (c, wt) =>
        assert(li.schema(c).dataType == wt, s"$sf: lineitem.$c is " +
          s"${li.schema(c).dataType}, Det decimal-cast sums assume $wt")
      }
      // shipdate/orderdate: any timestamp flavor works (queries cast to
      // date); a LONG regeneration would need a tsUs-style adaptor
      for ((df, c) <- Seq((li, "l_shipdate"),
          (Tables.orders(spark, sf), "o_orderdate"))) {
        val t = df.schema(c).dataType
        assert(t == TimestampType || t == TimestampNTZType || t == DateType,
          s"$sf: $c reads as $t - date-key joins (q12) and period apps " +
            "need a typed date; add an adaptor like Tables.tsUs")
      }
    }
  }
}
