package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset[T] surface: case-class rows + a custom
  * `Aggregator[IN, BUF, OUT]` — the compile-time-checked API the engine
  * exposes alongside DataFrames (SURVEY §1 "Dataset[T] where type safety
  * pays"). The aggregator accumulates in BigDecimal so the typed path
  * meets the same cross-engine determinism bar as the Det helpers.
  */
object Typed {

  case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double)

  /** Exact decimal(18,2) sum of order totals, as a typed Aggregator. */
  object TotalValue extends Aggregator[OrderRow, java.math.BigDecimal, Double] {
    private val Two = java.math.MathContext.DECIMAL128
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, r: OrderRow): java.math.BigDecimal =
      b.add(new java.math.BigDecimal(r.o_totalprice, Two).setScale(2, java.math.RoundingMode.HALF_UP))
    override def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal =
      a.add(b)
    override def finish(b: java.math.BigDecimal): Double = b.doubleValue()
    override def bufferEncoder: Encoder[java.math.BigDecimal] =
      Encoders.DECIMAL.asInstanceOf[Encoder[java.math.BigDecimal]]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed groupByKey + custom Aggregator, oracle-matched against the
    * untyped SQL equivalent.
    */
  val typedAgg = Q(
    "q56_typed_agg",
    """SELECT o_orderstatus,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    import s.implicits._
    val ds = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderRow]
    ds.groupByKey(_.o_orderstatus)
      .agg(TotalValue.toColumn.name("total_value"),
        count(lit(1)).as("n_orders").as[Long])
      .toDF("o_orderstatus", "total_value", "n_orders")
      .orderBy(col("o_orderstatus"))
  }

  val specs: Seq[Q] = Seq(typedAgg)
}
