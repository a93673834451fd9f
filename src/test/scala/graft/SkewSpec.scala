package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted join: identical result set to the plain join, salt scatters a
  * hot key across buckets, and the join key really is (key, salt).
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  // 90% of the left side is one hot key
  private lazy val large = spark.range(0, 10000)
    .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(0L)).as("k"),
      ($"id" * 13 % 997).as("payload"))
  private lazy val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
    .toDF("sk", "dim")

  test("salted join returns exactly the plain join's rows") {
    val plain = large.join(small, $"k" === $"sk")
      .select($"k", $"payload", $"dim")
    val salted = Skew.saltedJoin(large, small, col("k"), col("sk"), 8)
      .select($"k", $"payload", $"dim")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the hot key's rows scatter across all salt buckets") {
    val salts = large.filter($"k" === 0L)
      .withColumn("__salt", pmod(xxhash64(large.columns.map(col): _*), lit(8L)))
      .groupBy($"__salt").count().collect()
    assert(salts.length == 8, s"hot key used only ${salts.length}/8 buckets")
    // roughly balanced: no bucket holds more than 2x its fair share
    val counts = salts.map(_.getLong(1))
    assert(counts.max < 2L * counts.sum / 8, s"unbalanced: ${counts.toSeq}")
  }

  test("plan joins on (key, salt), small side replicated via explode") {
    val p = Skew.saltedJoin(large, small, col("k"), col("sk"), 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p.take(1500))
    assert(p.contains("Generate explode") || p.contains("explode"), p.take(1500))
  }
}
