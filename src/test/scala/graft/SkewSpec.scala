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

  test("FULLY-DUPLICATE hot rows still scatter across all salt buckets") {
    // The real-world hot shape: every row of the hot key is bit-identical,
    // so a content-derived salt (xxhash64 of the columns) would put all of
    // them in ONE bucket. The per-row salt must scatter them anyway.
    val dupHot = spark.range(0, 9000).select(lit(0L).as("k"), lit(42L).as("payload"))
    val salts = dupHot
      .withColumn("__s", pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
      .groupBy($"__s").count().collect()
    assert(salts.length == 8, s"duplicate hot rows used only ${salts.length}/8 buckets")
    // roughly balanced: no bucket holds more than 2x its fair share
    val counts = salts.map(_.getLong(1))
    assert(counts.max < 2L * counts.sum / 8, s"unbalanced: ${counts.toSeq}")
  }

  test("duplicate-hot-row join result matches the plain join (multiplicity kept)") {
    val dupHot = spark.range(0, 500).select(lit(0L).as("k"), lit(42L).as("payload"))
    val plain = dupHot.join(small, $"k" === $"sk").select($"k", $"payload", $"dim")
    val salted = Skew.saltedJoin(dupHot, small, col("k"), col("sk"), 8)
      .select($"k", $"payload", $"dim")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("plan joins on (key, salt), small side replicated via explode") {
    val p = Skew.saltedJoin(large, small, col("k"), col("sk"), 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__graft_salt"), p.take(1500))
    assert(p.contains("Generate explode") || p.contains("explode"), p.take(1500))
  }

  test("a caller-owned __graft_salt0 column survives intact") {
    val withSalt = large.withColumn("__graft_salt0", lit(99L))
    val out = Skew.saltedJoin(withSalt, small, col("k"), col("sk"), 4)
    assert(out.columns.contains("__graft_salt0"))
    assert(out.select("__graft_salt0").distinct().collect().map(_.getLong(0)).toSeq == Seq(99L))
  }
}
