package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Bloom-filter membership as a Column predicate — the scale path for
  * incremental dedup: instead of anti-joining every arriving row against
  * a 100 TB corpus, broadcast a bloom filter of the corpus hashes (bits ≈
  * -n·ln(fpp)/ln²2 ≈ 1.2 GB for 10⁹ items at 1% fpp) and confine the
  * exact anti-join to the bloom-positive sliver. No false negatives, so
  * prefilter + exact-verify returns EXACTLY the plain anti-join's answer.
  *
  * Build uses `DataFrameStatFunctions.bloomFilter` (distributed partial
  * sketches, one driver-side merge); probe uses Catalyst's
  * `BloomFilterMightContain` — the same codegen'd expression Spark's own
  * runtime-filter rewrite injects — reached through the package bridge
  * because it is not in the public function registry. Both sides hash
  * with xxhash64 into `putLong`/`mightContainLong`, so the formats agree.
  */
object BloomFilters {

  /** Serialized bloom filter over xxhash64(c) of df's rows. */
  def build(df: DataFrame, c: Column, expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.select(xxhash64(c).as("__h")).stat.bloomFilter("__h", expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** True if xxhash64(c) may be in the serialized filter (false ⇒ definitely absent). */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftPlanBridge.column(BloomFilterMightContain(
      GraftPlanBridge.expr(lit(bloom)),
      GraftPlanBridge.expr(xxhash64(c))))
}
