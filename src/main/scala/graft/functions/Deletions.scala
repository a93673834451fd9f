package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a string's symmetric-delete neighborhood —
  * the string itself plus every single-character deletion. This is the
  * SymSpell blocking key set: two strings are within Levenshtein
  * distance 1 iff their neighborhoods intersect (substitution ⇒ same
  * position deleted on both; insertion/deletion ⇒ one side's deletion
  * equals the other side verbatim), so an equi-join on exploded
  * neighborhoods finds EVERY distance-≤1 pair — blocking is exact, not
  * approximate — while touching O(n·len) keys instead of O(n²) pairs.
  *
  * One tight loop per string (static-call codegen, stays inside
  * whole-stage codegen); the declarative transform(sequence(...)) form
  * would evaluate interpreted per deletion.
  */
case class Deletions(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_deletions"

  override def nullSafeEval(input: Any): Any =
    Deletions.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Deletions.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Deletions =
    copy(child = newChild)
}

object Deletions {
  /** [x, del_0(x), ..., del_{n-1}(x)] over Unicode code points. */
  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val cps = str.codePointCount(0, str.length)
    val out = new Array[Any](cps + 1)
    out(0) = s
    var i = 0
    var offset = 0
    while (i < cps) {
      val next = str.offsetByCodePoints(offset, 1)
      out(i + 1) = UTF8String.fromString(
        str.substring(0, offset) + str.substring(next))
      i += 1
      offset = next
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `deletions(name)`. */
  def deletions(s: Column): Column =
    GraftPlanBridge.column(Deletions(GraftPlanBridge.expr(s)))

  /** Idempotently register `graft_deletions(str)` for SQL callers. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deletions", exprs => Deletions(exprs.head), "scala_udf")
}
