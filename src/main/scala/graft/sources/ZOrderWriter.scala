package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order clustered parquet writes: multi-dimensional data skipping.
  *
  * `Ingest.writeClusteredParquet` makes row-group min/max stats selective
  * for ONE leading dimension; predicates on a second clustering column
  * still scan everything. Interleaving the bits of two bucketized
  * dimensions into a Morton (z) value and range-clustering on THAT gives
  * every file a narrow min/max range in BOTH dimensions — point/range
  * predicates on either column skip most files. This is the standard
  * lakehouse technique (Delta/Iceberg `OPTIMIZE ZORDER BY`), built here
  * from plain codegen'd bit arithmetic — no custom expression needed.
  *
  * Dimensions enter as already-bucketized ints in [0, 65536); callers
  * map raw values with whatever bucketing fits (modulo for ids, fixed
  * width for amounts, epoch-day for dates). Interleaving is the classic
  * bit-spread: each 16-bit input spreads across 32 bits, y shifted one
  * left, OR'd — z fits in a non-negative int64.
  */
object ZOrderWriter {

  /** Spread the low 16 bits of c across 32 bits (0bABCD → 0b0A0B0C0D). */
  private[sources] def spread16(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit bucket columns. */
  def zValue(x: Column, y: Column): Column =
    spread16(x.cast("long")).bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** Write df as `numFiles` parquet files range-clustered on
    * zValue(xBucket, yBucket), sorted within files so row-group stats
    * are tight on both source dimensions.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
      xBucket: Column, yBucket: Column): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val z = zValue(xBucket, yBucket).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
