package graft

/** Registry-level contract checks: every query runs on sf0.001, the
  * flagship smoke holds, and oracle SQL stays in sync with the registry.
  */
class QueriesSpec extends SparkSuite {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all registered queries execute on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf0001).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("queries that must be non-empty on sf0.001 are non-empty") {
    // q15 (anti join) may legitimately be empty; everything else should
    // produce rows even at the smallest scale factor.
    val allowEmpty = Set("q15_join_anti", "q31_dedup_ngram_jaccard",
      "q32_dedup_minhash_lsh", "q42_embedding_neardup")
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if !allowEmpty(name) && fn(spark, sf0001).isEmpty => name
    }
    assert(empty.isEmpty, s"unexpectedly empty: $empty")
  }
}
