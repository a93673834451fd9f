package graft

import graft.plans.TopK
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only scratch main: native top-k vs window row_number timing. */
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
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm
    li.count()
    val order = Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false))
    time("warm native")(TopK.perGroup(li, 2, Seq("l_suppkey"), order).count())
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    def windowed = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    time("window 1")(windowed.count())
    time("window 2")(windowed.count())
    time("native 1")(TopK.perGroup(li, 2, Seq("l_suppkey"), order).count())
    time("native 2")(TopK.perGroup(li, 2, Seq("l_suppkey"), order).count())
    spark.stop()
  }
}
