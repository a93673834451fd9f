package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom Catalyst surface: native top-k per group.
  *
  * The declarative formulation (`row_number().over(window) <= k`) must
  * SORT every group completely before discarding all but k rows. This
  * operator keeps a bounded heap of k rows per group instead — O(n log k)
  * with O(groups·k) memory, no full sort, no spill pressure from rows
  * that can never survive. At 100 TB ("top 3 documents per domain") the
  * difference is sorting the corpus vs streaming over it.
  *
  * Wiring: logical node → planner Strategy (installed idempotently via
  * the public `spark.experimental.extraStrategies` hook, so it works on
  * harness-owned sessions) → physical exec that declares
  * ClusteredDistribution so Catalyst inserts the group-key exchange.
  */
case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = orderExprs
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      // ascending "rank" ordering: the first k rows in this order survive
      val ord = RowOrdering.create(orderLocal, childOutput)
      // max-heap by rank: head = current worst survivor, evicted first
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kLocal) {
          heap += row.copy()
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // dequeueAll yields worst-first
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Install the strategy (idempotent) and plan a native top-k per group.
    * Columns are referenced by name and resolved directly against the
    * child's analyzed output (bypassing Column's lazy resolution, which
    * only happens inside Dataset API operators); `descending = true` in
    * an order spec flips that key.
    */
  def perGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    Strategies.ensureInstalled(spark, TopKStrategy)
    val child = df.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name)}"))
    val sortOrders = orderCols.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    GraftPlanBridge.ofRows(spark,
      TopKPerGroup(k, groupCols.map(attr), sortOrders, child))
  }
}
