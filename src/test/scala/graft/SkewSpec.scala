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

  test("default mode: distinct hot-key rows scatter, salts replay deterministically") {
    val salts = large.filter($"k" === 0L)
      .withColumn("__s", pmod(xxhash64(large.columns.map(col): _*), lit(8L)))
      .groupBy($"__s").count().collect()
    assert(salts.length == 8, s"hot key used only ${salts.length}/8 buckets")
    val counts = salts.map(_.getLong(1))
    assert(counts.max < 2L * counts.sum / 8, s"unbalanced: ${counts.toSeq}")
  }

  test("scatterDuplicates: FULLY-DUPLICATE hot rows spread across all buckets") {
    // The duplicate-skew shape: every row of the hot key is bit-identical,
    // so the default content-derived salt puts all of them in ONE bucket;
    // the per-row mode must scatter them anyway.
    val dupHot = spark.range(0, 9000).select(lit(0L).as("k"), lit(42L).as("payload"))
    val salts = dupHot
      .withColumn("__s", pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
      .groupBy($"__s").count().collect()
    assert(salts.length == 8, s"duplicate hot rows used only ${salts.length}/8 buckets")
    // roughly balanced: no bucket holds more than 2x its fair share
    val counts = salts.map(_.getLong(1))
    assert(counts.max < 2L * counts.sum / 8, s"unbalanced: ${counts.toSeq}")
  }

  test("duplicate-hot-row join matches the plain join in BOTH salt modes") {
    val dupHot = spark.range(0, 500).select(lit(0L).as("k"), lit(42L).as("payload"))
    val plain = dupHot.join(small, $"k" === $"sk").select($"k", $"payload", $"dim")
    for (scatter <- Seq(false, true)) {
      val salted = Skew.saltedJoin(dupHot, small, col("k"), col("sk"), 8,
          scatterDuplicates = scatter)
        .select($"k", $"payload", $"dim")
      assert(salted.count() == plain.count(), s"scatterDuplicates=$scatter")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"scatterDuplicates=$scatter")
    }
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
