package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, composed from
  * Spark's higher-order array functions (`zip_with` + `aggregate`) — fully
  * codegen-compatible, no UDFs, so the hot loop stays in Tungsten.
  *
  * All math is done in double: float32 inputs are upcast first so results
  * match an oracle computing in double (and accumulate less error at
  * dimension 1k+).
  */
object VectorFunctions {

  /** Upcast array<float> → array<double>. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-order dot product (deterministic fold, not tree-reduced). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot(a,b) / (‖a‖·‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
