package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for inspecting plans and stage timings. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    val sh = docs.withColumn("shingles", expr(
      "array_distinct(transform(sequence(1, size(toks) - 2), i -> " +
        "concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))"))
    time("shingles")(sh.select(explode(col("shingles"))).count())
    val hs = sh.withColumn("h", expr(
      "transform(shingles, s -> CAST(conv(substr(md5(s), 1, 7), 16, 10) AS BIGINT))"))
    time("hashes")(hs.select(explode(col("h"))).count())
    val sigs = hs.select(col("doc_id"), expr(
      "transform(sequence(0, 15), j -> " +
        "array_min(transform(h, v -> " +
        "(v * (1000003 * j + 12345) + (777767 * j + 1)) % 2147483647)))").as("sig"))
    time("sigs")(sigs.count())
    val bands = sigs.select(col("doc_id"), posexplode(expr(
      "transform(sequence(0, 7), b -> " +
        "md5(concat(CAST(element_at(sig, 2*b+1) AS STRING), ',', CAST(element_at(sig, 2*b+2) AS STRING))))"))
      .as(Seq("b", "bkey")))
    time("bands")(bands.count())
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    time("cand")(cand.count())
    val full = graft.ops.TextOps.minhashLsh.run(spark, d)
    time("full")(full.count())
    full.explain("formatted")
    spark.stop()
  }
}
