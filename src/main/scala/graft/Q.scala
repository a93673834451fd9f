package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark-side implementation plus (when
  * SQL-expressible) the equivalent DuckDB oracle the driver hash-compares
  * against. Keeping both in one value prevents name/alias drift — the
  * driver's comparator sorts columns by NAME, so Spark aliases and oracle
  * aliases must match exactly.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
