package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan-time skipping — the 100 TB lever that
  * costs nothing at query time: parquet keeps per-row-group min/max
  * statistics, so a write ordered such that BOTH filter dimensions are
  * locally confined lets a 2-D box predicate skip most row groups
  * entirely. A single-column sort confines only its own column; the
  * Z-ORDER (Morton) curve interleaves the bit planes of two bucketed
  * keys so every contiguous key range maps to a small rectangle in
  * (x, y) space — the standard multi-dimensional clustering recipe
  * (Morton 1966; the technique behind commercial OPTIMIZE ZORDER BY).
  *
  * [[zkey]] is pure shifts/masks over two bucketed LONG columns — fully
  * codegen'd, no UDF. [[writeZOrdered]] range-partitions and sorts by
  * the key, so file AND row-group boundaries land on curve order.
  * LayoutSpec pins the bijection against a driver-side reference, the
  * locality bound (each 2^(2k)-sized key block confines x and y to
  * 2^k-wide quadrants), and measures the layout win: the fraction of
  * files a box query must touch vs an unclustered write of the same
  * data.
  */
object Layout {

  /** Morton/Z-order interleave of the low `bits` bits of `x` and `y`
    * (both must already be bucketed into [0, 2^bits)): bit i of `x`
    * lands at position 2i, bit i of `y` at 2i+1.
    */
  def zkey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val mask = 1L << i
      shiftleft(x.bitwiseAND(lit(mask)), i) +
        shiftleft(y.bitwiseAND(lit(mask)), i + 1)
    }.reduce(_ + _)
  }

  /** SQL text of the same interleave (for oracle generation): DuckDB and
    * Spark SQL agree on `&` and `<<` over BIGINT.
    */
  def zkeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      val mask = 1L << i
      s"((($x) & $mask) << $i) + ((($y) & $mask) << ${i + 1})"
    }.mkString(" + ")

  /** Write `df` parquet clustered on the Z-order curve of the two
    * bucketed key columns: range-partition into `parts` files by the
    * key, sort within each, drop the helper column. Both key dimensions
    * end up locally confined in every file and row group, so min/max
    * stats prune 2-D box predicates at scan time.
    */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, bits: Int,
      parts: Int, dir: String): Unit = {
    val keyed = df.withColumn("__zkey", zkey(x, y, bits))
    keyed.repartitionByRange(parts, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(dir)
  }
}
