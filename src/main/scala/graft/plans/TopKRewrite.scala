package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the declarative top-k-per-group idiom
  *
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * into the native [[TopKPerGroup]] operator (bounded heap per group, no
  * full per-group sort) — users keep the standard window form and the
  * engine swaps the plan, the same contract as Spark's own
  * InferWindowGroupLimit but ending in an O(n log k) operator instead of
  * a rank-limited sort. Measured on q18's shape: the window form sorts
  * every group completely; the heap streams past rows that can never
  * survive (BENCH.md: 1.33 → 0.60 s at sf0.1).
  *
  * The match is deliberately STRICT — all of:
  *  - exactly one window expression in the Window node, and it is
  *    `row_number()` (→ the plain k-heap) or `rank()` (→ the heap's
  *    tie-preserving mode: every row tying the k-th position survives;
  *    `dense_rank` counts DISTINCT positions and stays on the window
  *    path);
  *  - non-empty partition spec (the global case is
  *    TakeOrderedAndProject's job) and non-empty order spec;
  *  - the filter is a sole rank predicate with an integer literal
  *    (`rn <= k`, `rn < k`, `k >= rn`, `k > rn`, `rn = 1`) — compound
  *    conditions are left alone;
  *  - a Project sits directly above and does NOT reference the rank
  *    (a query that outputs the rank needs the window form) — EXCEPT
  *    the keep-first case: a bare `filter(rn = 1)` with no Project
  *    above (the dedup idiom feeding straight into a join/agg, or one
  *    that keeps the rn column) also rewrites, because every surviving
  *    row's rank is the CONSTANT 1 — the rank column is re-emitted as
  *    a literal over the heap, preserving the schema and the original
  *    attribute id for upstream references.
  *
  * Row ORDER within a group differs from the window form (heap emission
  * vs sorted scan) — identical row SETS; rank ties at the boundary are
  * resolved arbitrarily by both forms (Spark's window tie order is
  * partition-layout-dependent), so a caller needing determinism needs a
  * total order either way (the repo-wide oracle convention).
  *
  * A Spark-inserted [[WindowGroupLimit]] below the Window (its own
  * rank-limit optimization) is stripped — the native operator subsumes
  * it.
  *
  * Opt-out without rebuilding the session:
  * `spark.conf.set("spark.graft.topkRewrite.enabled", "false")` — the
  * rule stays installed but passes plans through untouched, restoring
  * the window form's within-partition emission order for callers that
  * relied on it without a trailing orderBy. Read per plan via SQLConf,
  * so flipping it affects the next query, not just new sessions.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Session conf key gating the rewrite (default on). */
  val EnabledKey = "spark.graft.topkRewrite.enabled"

  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k > Int.MinValue => Some(k - 1) // no underflow
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) && k > Int.MinValue => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def stripGroupLimit(child: LogicalPlan): LogicalPlan = child match {
    case wgl: WindowGroupLimit => wgl.child
    case other => other
  }

  // Boolean.parseBoolean never throws (anything but "true" is false), so
  // a user setting the flag to garbage disables the rewrite instead of
  // failing the planning of every query in the session.
  override def apply(plan: LogicalPlan): LogicalPlan = if (
    !java.lang.Boolean.parseBoolean(conf.getConfString(EnabledKey, "true"))) plan
  else {
    // Pass 1: the Project(Filter(Window)) idiom — rank dropped above.
    val afterProjected = plan.transformUp {
      case p @ Project(projectList, Filter(cond, w: Window))
          if w.windowExpressions.size == 1 &&
            w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
        w.windowExpressions.head match {
          case a @ Alias(WindowExpression(fn, _), _)
              if fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank] =>
            val rn = a.toAttribute
            rankLimit(cond, rn) match {
              case Some(k) if k >= 1 && !projectList.exists(_.references.contains(rn)) =>
                Project(projectList,
                  TopKPerGroup(k, w.partitionSpec, w.orderSpec, stripGroupLimit(w.child),
                    withTies = fn.isInstanceOf[Rank]))
              case _ => p
            }
          case _ => p
        }
    }
    // Pass 2: bare keep-first filters the first pass left behind (no
    // Project above, or the rank column is kept). Only k = 1 is
    // expressible without the window: the surviving rank is literally
    // 1, re-emitted under the original attribute id.
    afterProjected.transformUp {
      case f @ Filter(cond, w: Window)
          if w.windowExpressions.size == 1 &&
            w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
        w.windowExpressions.head match {
          case a @ Alias(WindowExpression(fn, _), _)
              if fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank] =>
            rankLimit(cond, a.toAttribute) match {
              case Some(1) =>
                Project(
                  w.child.output :+ Alias(Literal(1, IntegerType), a.name)(exprId = a.exprId),
                  TopKPerGroup(1, w.partitionSpec, w.orderSpec, stripGroupLimit(w.child),
                    withTies = fn.isInstanceOf[Rank]))
              case _ => f
            }
          case _ => f
        }
    }
  }
}

object TopKRewriteInstall {
  private val lock = new Object

  /** Install the rewrite AND its planning strategy together on a live
    * session (the rule without the strategy would produce an unplannable
    * node). Same public-hook, idempotent-under-lock pattern as
    * [[Strategies.ensureInstalled]]; sessions built with
    * [[graft.GraftExtensions]] get both at build time instead.
    */
  def ensureInstalled(spark: SparkSession): Unit = {
    Strategies.ensureInstalled(spark, TopKStrategy)
    lock.synchronized {
      if (!spark.experimental.extraOptimizations.contains(TopKRewrite)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ TopKRewrite
      }
    }
  }
}
