package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom Catalyst surface #2: native as-of join.
  *
  * For each left row, attach the LATEST right row of the same key with
  * right.ts <= left.ts (left outer: no qualifying right row → nulls).
  * The declarative alternatives are a union-marker window pass (one extra
  * shuffle-wide sort over the union, q43) or an inequality join
  * (O(pairs)). This exec declares ClusteredDistribution on both keys and
  * per-partition (key, ts) ordering, then streams BOTH sorted sides in
  * one O(n+m) merge with O(1) state — one buffered candidate row — per
  * partition: no union materialization, no per-group buffering, nothing
  * quadratic. At 100 TB this is the shape of "join each trade to the
  * latest quote".
  *
  * Right-side ordering may carry tie-break columns after ts: among
  * equal-(key, ts) right rows the LAST in that order wins, which lets
  * callers pin deterministic winners (q43's max-event_id semantics).
  */
case class AsOfJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreaks: Seq[Expression],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreaks: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTieBreaks)).map(SortOrder(_, Ascending)))

  // zip preserves the left child's partitioning; downstream ops keyed on
  // the join keys reuse the exchange.
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeysL = leftKeys; val rKeysL = rightKeys
    val lTsL = leftTs; val rTsL = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysL, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeysL, rightOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTsL), leftOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTsL), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeysL.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTsL.dataType))
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow

      // single-row lookahead over the right side; rows are COPIED into
      // the lookahead because the child iterator reuses its UnsafeRow
      var rightAhead: InternalRow = null
      def advanceRight(): Unit =
        rightAhead = if (rIter.hasNext) rIter.next().copy() else null
      advanceRight()

      // the latest qualifying right row for the current left key
      var candidate: InternalRow = null
      var candidateKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        if (candidate != null && keyOrd.compare(candidateKey, lKey) != 0) {
          candidate = null; candidateKey = null
        }
        val lTsRow = lTsProj(lRow).copy()
        var done = false
        while (!done && rightAhead != null) {
          val cmp = keyOrd.compare(rKeyProj(rightAhead), lKey)
          if (cmp < 0) advanceRight() // right key behind every remaining left row
          else if (cmp == 0 && tsOrd.compare(rTsProj(rightAhead), lTsRow) <= 0) {
            candidate = rightAhead // already a copy; later qualifiers overwrite
            candidateKey = lKey.copy()
            advanceRight()
          } else done = true // right ahead of this left row; revisit later
        }
        joined(lRow, if (candidate != null) candidate else nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, tb, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOf {
  /** Plan a native as-of join (strategy installed idempotently). Column
    * names resolve against each side's analyzed output; right column
    * names should be pre-renamed if they collide with left ones (the
    * operator keeps both outputs positionally).
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTsCol: String, rightTsCol: String,
      rightTieBreaks: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    Strategies.ensureInstalled(spark, AsOfStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name)}"))
    GraftPlanBridge.ofRows(spark, AsOfJoin(
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      attr(lPlan, leftTsCol), attr(rPlan, rightTsCol),
      rightTieBreaks.map(attr(rPlan, _)), lPlan, rPlan))
  }
}
