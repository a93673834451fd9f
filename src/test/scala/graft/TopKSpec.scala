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

  test("rewrite opt-out: the session conf flag restores the window plan") {
    val s = rewriteSession
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    def planOf() = liOn(s).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .queryExecution.executedPlan.toString
    s.conf.set(graft.plans.TopKRewrite.EnabledKey, "false")
    try {
      val off = planOf()
      assert(!off.contains("TopKPerGroup"), off.take(1200))
      assert(off.contains("Window"), off.take(1200))
    } finally s.conf.unset(graft.plans.TopKRewrite.EnabledKey)
    // flipping back re-enables on the NEXT plan, same session
    assert(planOf().contains("TopKPerGroup"))
    // an unparseable value must not fail planning (round-6 advice fix):
    // it reads as false — rewrite off, query still plans and runs
    s.conf.set(graft.plans.TopKRewrite.EnabledKey, "banana")
    try {
      val garbage = planOf()
      assert(!garbage.contains("TopKPerGroup"), garbage.take(1200))
      assert(garbage.contains("Window"), garbage.take(1200))
    } finally s.conf.unset(graft.plans.TopKRewrite.EnabledKey)
  }

  test("rewrite guards: compound filter, dense_rank()") {
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"))
    val base = liOn(rewriteSession)
    // compound condition -> left alone
    val compound = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("l_linenumber") === 1).drop("rn")
    assert(!compound.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // dense_rank counts DISTINCT positions -> different semantics, kept
    val dr = base.withColumn("rn", dense_rank().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(!dr.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("rewrite: rank kept in the output is heap-emitted, numbers equal the window's") {
    // total order so the emitted numbers are deterministic either way
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    def idiom(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"))
        .orderBy(col("l_suppkey"), col("rn"))
    val rewritten = idiom(liOn(rewriteSession))
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(1200))
    assert(!plan.contains("Window"), plan.take(1200))
    assert(rewritten.collect().toSeq == idiom(li).collect().toSeq)
    // the q201 shape: rank CAST above the filter (project references rn)
    def q201ish(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn0", row_number().over(w))
        .filter(col("rn0") <= 3)
        .select(col("l_suppkey"), col("rn0").cast("long").as("rnk"), col("l_orderkey"))
        .orderBy(col("l_suppkey"), col("rnk"))
    val q201plan = q201ish(liOn(rewriteSession)).queryExecution.executedPlan.toString
    assert(q201plan.contains("TopKPerGroup") && !q201plan.contains("Window"),
      q201plan.take(1200))
    assert(q201ish(liOn(rewriteSession)).collect().toSeq == q201ish(li).collect().toSeq)
  }

  test("rewrite: rank() kept in the output emits competition ranks (ties share numbers)") {
    // deliberately NON-total order (price only) so boundary ties exist
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice"))
    def idiom(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("rk"))
    val rewritten = idiom(liOn(rewriteSession))
    assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // (row identity, rank) pairs agree exactly — rank() is a pure
    // function of the order VALUES, so even with arbitrary tie order
    // both forms assign each physical row the identical rank
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(canon(rewritten) == canon(idiom(li)))
  }

  test("rewrite: rank() idiom becomes the tie-preserving heap, results equal") {
    // deliberately NON-total order (price only) so boundary ties exist
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice"))
    def idiom(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rk", rank().over(w)).filter(col("rk") <= 3).drop("rk")
    val rewritten = idiom(liOn(rewriteSession))
    assert(rewritten.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(canon(rewritten) == canon(idiom(li))) // tie sets agree exactly
  }

  test("tie mode keeps every boundary tie and drops cleared ones (crafted)") {
    import rewriteSession.implicits._
    // group A: k=2 boundary value 5 has three copies arriving AFTER the
    // heap is full, plus a later better row that must NOT clear them;
    // group B: the boundary improves past the old value -> ties drop.
    val df = Seq(
      ("A", 5, 1), ("A", 5, 2), ("A", 4, 3), ("A", 5, 4), ("A", 5, 5),
      ("B", 9, 1), ("B", 9, 2), ("B", 3, 3), ("B", 2, 4))
      .toDF("g", "v", "id")
    val got = TopK.perGroup(df, 2, Seq("g"), Seq(("v", false)), withTies = true)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    // A: sorted v = [4,5,5,5,5]; rank<=2 keeps 4 and ALL four 5s
    // B: sorted v = [2,3,9,9]; rank<=2 keeps 2 and 3, the 9s cleared
    val wantA = Set(("A", 4, 3), ("A", 5, 1), ("A", 5, 2), ("A", 5, 4), ("A", 5, 5))
    val wantB = Set(("B", 2, 4), ("B", 3, 3))
    assert(got == wantA ++ wantB, got.toString)
  }

  test("rewrite: bare keep-first filter (rn kept, no Project) becomes a heap") {
    val s = rewriteSession
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    // the dedup idiom WITHOUT dropping rn — reaches the rule as a bare
    // Filter(Window); the rank re-emits as the constant 1
    val df = liOn(s).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(1200))
    assert(!plan.contains("Window"), plan.take(1200))
    val got = df.orderBy(col("l_suppkey")).collect().toSeq
    val want = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).orderBy(col("l_suppkey")).collect().toSeq
    assert(got == want) // includes the rn column, constant 1
    // k > 1 with the rank kept: the heap emits the rank column (round 14)
    val wide = liOn(s).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    val widePlan = wide.queryExecution.executedPlan.toString
    assert(widePlan.contains("TopKPerGroup") && !widePlan.contains("Window"),
      widePlan.take(1200))
    val wideGot = wide.orderBy(col("l_suppkey"), col("rn")).collect().toSeq
    val wideWant = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).orderBy(col("l_suppkey"), col("rn")).collect().toSeq
    assert(wideGot == wideWant)
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
