package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Embedding near-dup bench: fixed 4-bit banding (q141's registered,
  * oracle-checkable form) vs the corpus-sized `nearDupPairsAuto`
  * banding, on `SPARK_GRAFT_SF_DIR`'s embeddings. One-shot wall times —
  * the point is the asymptotic gap, which dwarfs JIT noise at any
  * corpus where it matters.
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tune(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.DotProduct.register(spark)
    graft.functions.CosineSim.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      .localCheckpoint()
    println(s"DEDUPBENCH corpus ${e.count()} vectors")
    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"DEDUPBENCH $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s (pairs=$n)")
    }
    val planes16 = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("p_id"), col("v").as("pv"))
    timed("auto_banding") {
      ops.VectorSearch.nearDupPairsAuto(e, nBands = 4, threshold = 0.4).count()
    }
    timed("fixed_4bit") {
      ops.VectorSearch.nearDupPairs(e, planes16, 4, 0.4).count()
    }
    spark.stop()
  }
}
