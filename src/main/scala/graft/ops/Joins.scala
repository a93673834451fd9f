package graft.ops

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Join family: every join form the reference uses (SURVEY §2.3 J1-J9 —
  * all inner equi-joins) plus the standard forms a complete engine exposes
  * (left outer, left semi, left anti).
  *
  * Scale strategy: dimension sides (region/nation/customer/supplier/date-dim)
  * are explicitly `broadcast()` — no shuffle of the fact side. Fact-fact
  * joins (lineitem ⋈ orders) shuffle on the join key and are left to
  * sort-merge + AQE, which is the right call at 100 TB; at that scale the
  * further win is bucketing both tables on orderkey at write time.
  */
object Joins {

  /** USING-style single-name join (J1, reference 05:93-97). */
  val joinUsing = Q(
    "q10_join_using",
    """SELECT o_custkey, o_orderkey, c_name, c_mktsegment, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > 250000
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
    val c = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_mktsegment"))
    o.join(broadcast(c), Seq("o_custkey"), "inner")
      .select(col("o_custkey"), col("o_orderkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Expression equi-join + post-join drop of the duplicate key column
    * (J2, reference 05:101-105).
    */
  val joinExprDrop = Q(
    "q11_join_expr_drop",
    """SELECT s_suppkey, s_name, s_acctbal, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"), "inner")
      .drop(n("n_nationkey")).drop(sup("s_nationkey")).drop(n("n_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** Derived-int-key date join, yyyyMMdd on both sides (J3/J5,
    * reference 05:110-126): fact gets a derived date_key, joins the
    * generated calendar dimension, aggregates by calendar attribute.
    */
  val joinDateKey = Q(
    "q12_join_datekey",
    """WITH dim_date AS (
      |  SELECT CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
      |         strftime(d, '%A') AS day_name
      |  FROM (SELECT unnest(generate_series(DATE '1992-01-01', DATE '2005-12-31', INTERVAL 1 DAY)) AS d)),
      |fact AS (
      |  SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER) AS date_key, o_totalprice
      |  FROM orders)
      |SELECT day_name,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM fact JOIN dim_date USING (date_key)
      |GROUP BY day_name
      |ORDER BY day_name""".stripMargin) { (s, d) =>
    // Shared session calendar (computed once, reused by q08): the extra
    // 2006-2021 tail is invisible to this inner join.
    val dimDate = Dimensional.calendar(s)
      .select(col("date_key"), col("day_name"))
    val fact = Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("date_key"),
        col("o_totalprice"))
    fact.join(broadcast(dimDate), Seq("date_key"), "inner")
      .groupBy(col("day_name"))
      .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("day_name"))
  }

  /** Aliased multi-hop star join (J4 shape, reference 07:88-89, widened):
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region → revenue rollup.
    */
  val joinMultiHop = Q(
    "q13_join_multihop",
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    // Same partial-aggregation-before-join trick as q02: items collapse to
    // per-order partials before touching the join chain.
    val liAgg = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .cast("decimal(28,4)")).as("rev_dec"),
        count(lit(1)).as("n_items_order"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
    liAgg.join(o, liAgg("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev_dec")).cast("double").as("revenue"),
        sum(col("n_items_order")).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left semi join — EXISTS (capability beyond the reference). */
  val joinSemi = Q(
    "q14_join_semi",
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left anti join — NOT EXISTS. */
  val joinAnti = Q(
    "q15_join_anti",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left outer join with zero-preserving counts. */
  val joinOuter = Q(
    "q16_join_outer",
    """SELECT c_custkey,
      |  COUNT(o_orderkey) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).select(col("c_custkey"))
    val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(Det.dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  val specs: Seq[Q] = Seq(joinUsing, joinExprDrop, joinDateKey, joinMultiHop,
    joinSemi, joinAnti, joinOuter)
}
