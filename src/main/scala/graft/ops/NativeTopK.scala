package graft.ops

import graft.{Q, Tables}
import graft.plans.TopK
import org.apache.spark.sql.functions._

/** Registered query for the native top-k operator (graft.plans.TopK):
  * top-2 lineitems per supplier by extended price. The oracle is the
  * declarative row_number formulation — identical semantics, different
  * physical algorithm (bounded heaps vs full per-group sort), so the
  * hash match is a non-circular equivalence check.
  */
object NativeTopK {

  val nativeTopK = Q(
    "q58_native_topk",
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 2
      |ORDER BY l_suppkey, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    TopK.perGroup(li, 2,
        groupCols = Seq("l_suppkey"),
        orderCols = Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)))
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
        col("l_orderkey"), col("l_linenumber"))
  }

  val specs: Seq[Q] = Seq(nativeTopK)
}
