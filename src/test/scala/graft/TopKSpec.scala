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

  // --- TopKRewrite: the optimizer swaps the window idiom for the native op ---

  private lazy val rewriteSession = {
    val s = spark.newSession() // shared context, isolated optimizer state
    graft.plans.TopKRewriteInstall.ensureInstalled(s)
    s
  }

  private def liOn(s: org.apache.spark.sql.SparkSession) =
    Tables.lineitem(s, sf0001)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  test("rewrite: the rank-filter idiom plans as TopKPerGroupExec, windows gone") {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val df = liOn(rewriteSession).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(1200))
    assert(!plan.contains("Window"), plan.take(1200)) // no WindowExec/GroupLimit left
    // ...and the rewritten plan returns exactly the window form's rows
    val got = df.orderBy(col("l_suppkey"), col("l_extendedprice").desc,
      col("l_orderkey"), col("l_linenumber")).collect().toSeq
    val want = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber")).collect().toSeq
    assert(got == want)
  }

  test("rewrite guards: rank in output, compound filter, rank()") {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"))
    val base = liOn(rewriteSession)
    // rank kept in the output -> the native op can't serve it
    val keepsRank = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"))
    assert(!keepsRank.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // compound condition -> left alone
    val compound = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("l_linenumber") === 1).drop("rn")
    assert(!compound.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // rank() admits ties -> different semantics, not rewritten
    val rk = base.withColumn("rn", rank().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!rk.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("rewrite: rn = 1 dedup idiom becomes a k=1 heap") {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"), col("l_linenumber"))
    val df = liOn(rewriteSession).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = df.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_suppkey")).collect().toSeq
    val want = li.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_suppkey")).collect().toSeq
    assert(got == want)
  }
}
