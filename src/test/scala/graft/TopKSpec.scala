package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSuite {

  private lazy val li = Tables.lineitem(spark, sf0001)
    .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  test("native operator plans as TopKPerGroupExec with one group-key exchange") {
    val df = TopK.perGroup(li, 3, Seq("l_suppkey"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)))
    // AQE wraps the plan, so match on the rendered tree
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(800))
    assert(plan.contains("Exchange hashpartitioning(l_suppkey"))
  }

  test("native top-k equals the row_number window formulation") {
    val native = TopK.perGroup(li, 3, Seq("l_suppkey"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)))
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .collect().toSeq
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .collect().toSeq
    assert(native == windowed)
  }

  test("k larger than any group returns every row") {
    val n = TopK.perGroup(li, 1000000, Seq("l_suppkey"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false))).count()
    assert(n == li.count())
  }

  test("unknown column fails with a named error") {
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(li, 1, Seq("nope"), Seq(("l_orderkey", false)))
    }
    assert(e.getMessage.contains("nope"))
  }
}
