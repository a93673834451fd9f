package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Test-table loaders + shared determinism helpers.
  *
  * All queries in this engine are hash-compared against a DuckDB oracle
  * (see `Verify.scala`), so every floating-point aggregate must be
  * bit-deterministic regardless of partition/summation order. The pattern
  * used throughout: cast to `decimal(18,2)` BEFORE summing (exact
  * arithmetic, order-independent), cast the exact result back to double.
  * The oracle SQL mirrors this with
  * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS); without this runtime conf a
      // harness-owned session that didn't set it would fail the scan.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Shared Column helpers enforcing cross-engine determinism. */
object Det {
  private val Money = DecimalType(18, 2)

  /** Order-independent exact sum of a monetary double column. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast("double")

  /** Round a double expression for oracle comparison. */
  def r4(c: Column): Column = round(c, 4)

  /** Order-independent sum of an arbitrary double column: round to `scale`
    * digits first (absorbing float noise), then sum exactly as decimal.
    */
  def rsum(c: Column, scale: Int): Column =
    sum(round(c, scale).cast(DecimalType(28, scale))).cast("double")

  /** Round-half-away-from-zero integer average (den > 0):
    * `(2*num + sign(num)*den) DIV (2*den)` rounds num/den to the NEAREST
    * integer (ties away from zero) for EVERY sign of `num` — the naive
    * `(2*num + den) DIV (2*den)` is only correct for num >= 0 (for
    * negative numerators its truncation overshoots even exact quotients
    * by one). Oracle pairing: DuckDB's INTEGER `//` truncates toward
    * zero exactly like Spark's `DIV` (verified: `-7 // 2` = -3 in both
    * engines — DuckDB only floors for DOUBLE operands), so oracles whose
    * numerator is provably non-negative may keep the short
    * `(2*n + d) // (2*d)` form (identical values), while any
    * negative-capable oracle (q75's embedding sums) must spell the sign
    * term: `(2*n + CASE WHEN n < 0 THEN -d ELSE d END) // (2*d)`.
    * Negative sums occur in real data, so this single definition — not
    * per-query re-derivations — is the only sanctioned form of an
    * oracle-checked rounded average. Call sites scale `num` up by 10^k
    * first to average at k decimal digits.
    */
  def halfUpDiv(num: Column, den: Column): Column =
    call_function("div",
      lit(2) * num + when(num < 0, -den).otherwise(den), lit(2) * den)
}
