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
  *  - a Project directly above may DROP the rank (plain heap) or KEEP
  *    it (round 14): the heap drains in rank order, so it re-emits the
  *    rank column itself — emission position for `row_number()`,
  *    competition rank for `rank()` — under the original attribute id
  *    (`TopKPerGroup.rankOutput`). A bare `filter(rn <= k)` with no
  *    Project above rewrites the same way; the `rn = 1` keep-first
  *    dedup idiom keeps its cheaper literal-1 re-emission (no per-row
  *    rank projection).
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
              case Some(k) if k >= 1 =>
                // rank referenced above? the heap emits it (rank order is
                // its drain order) under the same attribute id
                val keepsRank = projectList.exists(_.references.contains(rn))
                Project(projectList,
                  TopKPerGroup(k, w.partitionSpec, w.orderSpec, stripGroupLimit(w.child),
                    withTies = fn.isInstanceOf[Rank],
                    rankOutput = if (keepsRank) Some(rn) else None))
              case _ => p
            }
          case _ => p
        }
    }
    // Pass 2: bare rank filters the first pass left behind (no Project
    // above). k = 1 keeps the cheap literal re-emission (every surviving
    // rank IS 1); k > 1 has the heap emit the rank column itself, under
    // the original attribute id — output order matches the Window's
    // (child.output :+ rank), so no Project is needed.
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
              case Some(k) if k > 1 =>
                TopKPerGroup(k, w.partitionSpec, w.orderSpec, stripGroupLimit(w.child),
                  withTies = fn.isInstanceOf[Rank], rankOutput = Some(a.toAttribute))
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
