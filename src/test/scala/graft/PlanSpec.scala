package graft

import org.apache.spark.sql.functions._

/** Physical-plan quality assertions: these lock in the scale-relevant
  * plan shapes (predicate pushdown to the parquet scan, column pruning,
  * broadcast dimension joins, shuffle-free bucketed joins) so a future
  * refactor that silently degrades a plan fails the build.
  */
class PlanSpec extends SparkSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q10: totalprice filter is pushed down to the parquet scan") {
    val p = planOf("q10_join_using")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(o_totalprice,250000.0)"), p.take(2000))
  }

  test("q03: dimension join is a broadcast hash join") {
    assert(planOf("q03_segment_value").contains("BroadcastHashJoin"))
  }

  test("q13: all four dimension sides broadcast; no fact-side shuffle before aggregation") {
    val p = planOf("q13_join_multihop")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, p.take(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q01: scan prunes to exactly the referenced columns") {
    val p = planOf("q01_pricing_summary")
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).getOrElse(p)
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
      .foreach(c => assert(scanLine.contains(c), scanLine))
    Seq("l_shipdate", "l_orderkey", "l_partkey", "l_tax")
      .foreach(c => assert(!scanLine.contains(c), scanLine))
  }

  test("q23: top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(planOf("q23_top_orders").contains("TakeOrderedAndProject"))
  }

  test("q77: signatures materialize once; the band join is an equi hash join") {
    val p = planOf("q77_simhash_neardup")
    // Post-checkpoint both join sides read the signature RDD, so the
    // scan+explode+60-sum subtree must not appear twice (no parquet scan
    // survives into the executed pair-join plan at all).
    assert(!p.contains("Scan parquet"), p.take(2000))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("NestedLoop"), p.take(2000))
  }

  test("q80: centroids broadcast to the fleet side, which never shuffles pre-assignment") {
    val p = planOf("q80_kmeans_lloyd")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000)) // 8-row side broadcast
    assert(!p.contains("CartesianProduct"))
  }

  test("q82: session windows cost one data shuffle (plus the output sort)") {
    val p = planOf("q82_session_windows")
    assert("Exchange".r.findAllIn(p).size == 2, p.take(2000))
    assert(p.contains("MergingSessions"), p.take(2000))
  }

  test("q84: all five window functions share ONE Window node (one shuffle, one sort)") {
    val p = planOf("q84_window_navigation")
    assert("\\bWindow \\[".r.findAllIn(p).size == 1, p.take(2500))
    // exactly two exchanges: the window's hash partitioning + the output sort
    assert("Exchange".r.findAllIn(p).size == 2, p.take(2500))
  }

  test("q86: array set algebra is a single-scan narrow plan (no mid-plan shuffle)") {
    val p = planOf("q86_array_setops")
    // only the presentation orderBy exchanges; no aggregate/join shuffles
    assert("Exchange".r.findAllIn(p).size == 1, p.take(2500))
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).getOrElse(p)
    assert(scanLine.contains("doc_id") && !scanLine.contains("lang"), scanLine)
  }

  test("q88: min_by/max_by partial-aggregate map-side before the shuffle") {
    val p = planOf("q88_argminmax")
    assert(p.contains("partial_max_by") && p.contains("partial_min_by"), p.take(2500))
  }

  test("q116: moment matrix is one scan + one aggregate — no join, no self-product") {
    val p = planOf("q116_embedding_moments")
    assert(!p.contains("Join"), p.take(2000))
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("q130: full moment matrix is one scan + one aggregate; coords arrive broadcast") {
    val p = planOf("q130_full_moments")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the kernel runs inside whole-stage codegen, not interpreted
    assert(p.contains("graft_outer_upper"), p.take(2000))
  }

  test("q118: the capped vocabulary arrives broadcast at the token stream") {
    val p = planOf("q118_oov_rate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q117: the distinct span table materializes once (no parquet scan in the final plan)") {
    val p = planOf("q117_dup_span_fraction")
    assert(!p.contains("Scan parquet"), p.take(2000))
  }

  test("q146: BM25 tokenizes the corpus exactly once (round-8 single-pass lock)") {
    val p = planOf("q146_bm25_retrieval")
    // the checkpointed tf base is the ONLY Generate; doc lengths come
    // from a narrow size(split) projection, so a refactor reintroducing
    // the 4-pass shape fails here
    val generates = "Generate explode".r.findAllIn(p).size
    assert(generates <= 1, s"$generates tokenize passes in q146:\n${p.take(2000)}")
  }

  test("q177/q180/q181/q187: no window runs on a single partition (two-phase global order)") {
    // An empty-partition-spec window plans Window <- Sort <- Exchange
    // SinglePartition — one task holding the whole input. The GlobalOrder
    // rewrite partitions every window by the range-partition id; this pin
    // fails if a refactor reintroduces the global-window funnel. (Global
    // scalar AGGREGATES legitimately gather ≤ one row per partition into
    // a SinglePartition exchange; only Window-adjacent ones are flagged.)
    Seq("q177_balanced_shards", "q180_sequence_pack", "q181_curriculum_bins",
        "q187_balanced_manifest").foreach { name =>
      val lines = planOf(name).linesIterator.toVector
      lines.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Window")) {
          val below = lines.slice(i + 1, i + 5)
          assert(!below.exists(_.contains("Exchange SinglePartition")),
            s"$name plans a single-partition window:\n${(l +: below).mkString("\n")}")
        }
      }
    }
  }

  test("the hot-bucket cap plans NO window: two-pass aggregate + threshold join only") {
    // round-15 pin: LshGuard.capBuckets must never regress to the
    // row_number rank window (a collapsed bucket's single-task
    // O(m log m) sort). The capped frame's plan carries the KthSmallest
    // aggregation (as an ObjectHashAggregate pass-1 stage) and NO
    // Window node anywhere — q133's cap is inline, so its plan is the
    // witness (its only windows would be the cap's, it has none of its
    // own... it has none at all).
    val p = planOf("q133_semdedup_prune")
    assert(!p.contains("Window"),
      s"capBuckets reintroduced a window:\n${p.take(3000)}")
    assert(p.contains("graft_kth_smallest") || p.contains("ObjectHashAggregate"),
      s"two-pass cap's threshold aggregation missing from the plan:\n${p.take(3000)}")
  }

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).collect {
      case (name, fn) if fn(spark, sf0001).queryExecution.executedPlan
        .toString.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    import scala.reflect.io.Directory
    val dir = "/tmp/graft_test_partitioned"
    new Directory(new java.io.File(dir)).deleteRecursively()
    Tables.events(spark, sf0001).write.partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
      .select(col("event_id"), col("value"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p.take(1500))
    // pruned scan must touch only the matching partition directory
    val scanned = q.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
      .selectedPartitions.partitionCount
    assert(scanned == 1, s"scanned $scanned partitions")
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    import spark.implicits._
    // 90% of the left side lands on one key: with thresholds scaled down
    // to the test data size, AQE's skew-join rule must split the hot
    // partition instead of letting one task process 90% of the join.
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 60000)
        .select(when($"id" % 10 === 0, $"id" % 100).otherwise(0L).as("k"),
          ($"id" * 7 % 1000).as("payload"))
      val right = spark.range(0, 100).select($"id".as("k"), ($"id" * 3).as("dim"))
      // No groupBy on the join key: AQE will not split skewed partitions
      // if a downstream operator requires the join's hash partitioning
      // (splitting would force an extra shuffle), so aggregate globally.
      val joined = left.join(right, "k").agg(sum($"payload" + $"dim").as("s"))
      joined.collect() // AQE decides skew handling at runtime — must execute
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed co-partitioned join runs without a shuffle exchange") {
    import spark.implicits._
    import scala.reflect.io.Directory
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously failed run can leave the managed-table location behind
    Seq("b_orders", "b_lineitem").foreach { t =>
      new Directory(new java.io.File(s"/tmp/graft_test_warehouse/$t")).deleteRecursively()
    }
    Tables.orders(spark, sf0001).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"o_totalprice", $"l_quantity")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(joined.count() > 0)
  }
}
