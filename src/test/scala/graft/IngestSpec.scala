package graft

import graft.sources.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink roundtrips through every supported format. */
class IngestSpec extends SparkSuite {

  private lazy val dir = Files.createTempDirectory("graft_ingest").toString
  private lazy val orders = Tables.orders(spark, sf0001)

  test("parquet partitioned write prunes + roundtrips") {
    Ingest.writeParquetPartitioned(orders, s"$dir/p", "o_orderstatus")
    val back = Ingest.parquet(spark, s"$dir/p")
    assert(back.count() == orders.count())
    assert(back.filter(col("o_orderstatus") === "O").count() ==
      orders.filter(col("o_orderstatus") === "O").count())
  }

  test("orc roundtrips with identical aggregates") {
    Ingest.writeOrc(orders, s"$dir/orc")
    val back = Ingest.orc(spark, s"$dir/orc")
    assert(back.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head() ==
      orders.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head())
  }

  test("json lines roundtrips with explicit schema") {
    val subset = orders.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Ingest.writeJsonLines(subset, s"$dir/json")
    val back = Ingest.jsonLines(spark, s"$dir/json", subset.schema)
    assert(back.count() == subset.count())
    assert(back.schema == subset.schema)
  }

  test("compaction rewrites to a bounded file count") {
    orders.repartition(16).write.mode("overwrite").parquet(s"$dir/many")
    Ingest.compactParquet(spark, s"$dir/many", s"$dir/compacted", 2)
    val files = new java.io.File(s"$dir/compacted").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 2, s"got $files files")
    assert(Ingest.parquet(spark, s"$dir/compacted").count() == orders.count())
  }

  test("clustered write sorts within files so row-group stats are selective") {
    Ingest.writeClusteredParquet(orders, s"$dir/clustered", "o_totalprice")
    val firstFile = new java.io.File(s"$dir/clustered").listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val vals = spark.read.parquet(firstFile.getAbsolutePath)
      .select("o_totalprice").collect().map(_.getDouble(0)).toSeq
    assert(vals == vals.sorted, "file not sorted on cluster column")
  }

  test("csv with explicit schema roundtrips; all-null rows droppable") {
    val subset = orders.select(col("o_orderkey"), col("o_orderstatus"))
    subset.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val back = Ingest.csvWithSchema(spark, s"$dir/csv", subset.schema)
    assert(back.count() == subset.count())
    assert(Ingest.dropAllNullRows(back).count() == subset.count())
  }
}
