package graft

/** Lifecycle of the cross-query materialization cache (`graft.Shared`).
  *
  * Uses `spark.newSession()` (same SparkContext, distinct SparkSession) so
  * eviction can be exercised without stopping the JVM-shared test context.
  * The listener registered by `materialized` calls the same `evictSession`
  * tested here when the application ends.
  */
class SharedSpec extends SparkSuite {

  test("entries are keyed per session and evicted on session end") {
    import spark.implicits._
    val ns = spark.newSession()

    var builds = 0
    def base = { builds += 1; Seq(1, 2, 3).toDF("v") }

    val a = Shared.materialized(ns, "shared-spec-key")(base)
    val b = Shared.materialized(ns, "shared-spec-key")(base)
    assert(builds == 1, "second call must hit the cache, not rebuild")
    assert(a.count() == 3 && b.count() == 3)

    assert(Shared.cachedKeys(ns).contains("shared-spec-key"))
    assert(!Shared.cachedKeys(spark).contains("shared-spec-key"),
      "cache must be per-session: sibling session must not see the entry")

    Shared.evictSession(ns) // what the ApplicationEnd listener invokes
    assert(Shared.cachedKeys(ns).isEmpty, "stopped session's entries must be dropped")

    // A fresh share after eviction rebuilds rather than resurrecting state.
    Shared.materialized(ns, "shared-spec-key")(base)
    assert(builds == 2)
    Shared.evictSession(ns)
  }

  test("nested shares build outside any map callback (no recursive-update trap)") {
    import spark.implicits._
    val ns = spark.newSession()
    // Outer build depends on an inner share — the exact shape of
    // minhashCandidates -> minhashSigs. With computeIfAbsent this was a
    // JDK-forbidden recursive update; with build-then-putIfAbsent it is
    // plain recursion and must succeed regardless of key hashing.
    val outer = Shared.materialized(ns, "shared-spec-outer") {
      val inner = Shared.materialized(ns, "shared-spec-inner") {
        Seq(10, 20).toDF("v")
      }
      inner.select(($"v" + 1).as("v"))
    }
    assert(outer.as[Int].collect().sorted.toSeq == Seq(11, 21))
    assert(Shared.cachedKeys(ns) == Set("shared-spec-outer", "shared-spec-inner"))
    Shared.evictSession(ns)
  }
}
