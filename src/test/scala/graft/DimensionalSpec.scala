package graft

import graft.ops.Dimensional
import org.apache.spark.sql.functions._

/** The scale-path surrogate-key generators: sparse ids are unique with
  * zero shuffle; dense ids are gapless 0..n-1.
  */
class DimensionalSpec extends SparkSuite {

  private lazy val orders = Tables.orders(spark, sf0001).repartition(4)

  test("sparse surrogate keys: unique, no exchange in the plan") {
    val keyed = Dimensional.sparseSurrogateKeys(orders, "sk")
    val n = keyed.count()
    assert(keyed.select(countDistinct(col("sk"))).head.getLong(0) == n)
    // the generator itself must add no exchange beyond what the input
    // plan already had (here: the fixture's repartition)
    def exchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges(keyed) == exchanges(orders))
    val pPlain = Dimensional.sparseSurrogateKeys(Tables.orders(spark, sf0001), "sk")
      .queryExecution.executedPlan.toString
    assert(!pPlain.contains("Exchange"), pPlain.take(1500))
  }

  test("dense surrogate keys: exactly 0..n-1") {
    val keyed = Dimensional.denseSurrogateKeys(orders, "sk")
    val n = keyed.count()
    val stats = keyed.agg(min(col("sk")), max(col("sk")),
      countDistinct(col("sk"))).head
    assert(stats.getLong(0) == 0L && stats.getLong(1) == n - 1
      && stats.getLong(2) == n)
  }
}
