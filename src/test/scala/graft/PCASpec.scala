package graft

import graft.functions.PCA
import org.apache.spark.sql.functions._

/** PCA library-function semantics: Gram matrix against hand-computed
  * values, power iteration against a known dominant direction, and the
  * projection column against per-row dot products.
  */
class PCASpec extends SparkSuite {
  import spark.implicits._

  // Vectors concentrated along (3, 4)/5 with a small orthogonal
  // component: dominant eigenvector of the second moment is (0.6, 0.8).
  private lazy val df = Seq(
    (0L, Array(3.0f, 4.0f)),
    (1L, Array(6.0f, 8.0f)),
    (2L, Array(-3.0f, -4.0f)),
    (3L, Array(0.4f, -0.3f))) // orthogonal, tiny
    .toDF("vec_id", "embedding")

  test("secondMoment matches hand computation") {
    val m = PCA.secondMoment(df, "embedding", 2)
    // sum v0² = 9 + 36 + 9 + 0.16 = 54.16; /4 = 13.54
    // sum v0v1 = 12 + 48 + 12 - 0.12 = 71.88; /4 = 17.97
    // sum v1² = 16 + 64 + 16 + 0.09 = 96.09; /4 = 24.0225
    assert(math.abs(m(0)(0) - 13.54) < 1e-6)
    assert(math.abs(m(0)(1) - 17.97) < 1e-6)
    assert(math.abs(m(1)(0) - 17.97) < 1e-6)
    assert(math.abs(m(1)(1) - 24.0225) < 1e-6)
  }

  test("secondMoment ignores null and short rows instead of NPEing executors") {
    val dirty = df.union(Seq(
      (4L, null.asInstanceOf[Array[Float]]),
      (5L, Array(1.0f))) // shorter than dims
      .toDF("vec_id", "embedding"))
    val m = PCA.secondMoment(dirty, "embedding", 2)
    assert(math.abs(m(0)(0) - 13.54) < 1e-6) // same n=4 result as clean df
    assert(math.abs(m(1)(1) - 24.0225) < 1e-6)
    // all rows invalid -> the named empty-set error, not an executor NPE
    val allBad = Seq((0L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      PCA.secondMoment(allBad, "embedding", 2)
    }
    assert(e.getMessage.contains("empty embedding set"))
  }

  test("topComponent finds the dominant direction with positive-lead sign") {
    val (v, lambda) = PCA.topComponent(PCA.secondMoment(df, "embedding", 2))
    assert(math.abs(v(0) - 0.6) < 1e-3)
    assert(math.abs(v(1) - 0.8) < 1e-3)
    assert(lambda > 37.0 && lambda < 38.0) // top eigenvalue ≈ 37.56
  }

  test("project equals the per-row dot product with the component") {
    val comp = Array(0.6, 0.8)
    val got = df.select(col("vec_id"), PCA.project(col("embedding"), comp).as("p"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("p")).toMap
    assert(math.abs(got(0L) - (3.0 * 0.6 + 4.0 * 0.8)) < 1e-6)
    assert(math.abs(got(2L) - (-5.0)) < 1e-6)
    assert(math.abs(got(3L) - (0.4f * 0.6 + -0.3f * 0.8)) < 1e-6)
  }

  test("degenerate zero matrix returns zero eigenvalue") {
    val (_, lambda) = PCA.topComponent(Array.ofDim[Double](3, 3))
    assert(lambda == 0.0)
  }
}
