package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._

/** Principal-component extraction over an `array<float>` embedding
  * column: a distributed Gram (second-moment) matrix plus driver-side
  * power iteration, and a codegen'd projection column.
  *
  * Scale shape: the Gram matrix is ONE pass over the vectors with
  * per-partition accumulation (`treeAggregate`) — no shuffle of vector
  * data, no pairwise work; the driver receives d·(d+1)/2 doubles
  * (d = embedding dim), which is KB-sized for any realistic embedding
  * width. This is the same plan `spark.mllib`'s RowMatrix uses for its
  * Gramian, re-expressed here without the mllib dependency. Power
  * iteration then runs on the d×d matrix driver-side — an O(d²·iters)
  * scalar loop on an aggregate RESULT, not a `.collect()` of data.
  * Projection back onto the component is the codegen'd [[DotProduct]]
  * against a broadcast literal — a narrow projection at any corpus size.
  *
  * The q116 registered query oracle-checks the same second-moment
  * aggregation shape declaratively (explode to literal structs) at 8
  * dims; this entry point is the library form for full-width matrices,
  * where per-partition imperative accumulation beats a 2080-struct
  * explode (codegen method-size limits) — the one place RDD aggregation
  * is genuinely the right Spark tool.
  */
object PCA {

  /** Mean-uncentered second-moment matrix M[i][j] = Σ vᵢ·vⱼ / n over an
    * embedding column, as a dense symmetric d×d matrix. Rows whose
    * embedding is null or shorter than `dims` are ignored (and excluded
    * from n). For covariance, subtract the outer product of the mean
    * vector (means via q75's exact recipe).
    */
  def secondMoment(df: DataFrame, embedCol: String, dims: Int): Array[Array[Double]] = {
    val packedLen = dims * (dims + 1) / 2
    // plain Cast (codegen'd), not a transform() lambda — higher-order
    // array functions evaluate interpreted (repo-wide gotcha).
    // Null / short rows are excluded up front: without the filter they
    // surface as an opaque NullPointerException inside treeAggregate
    // executors (q116/q130 pre-filter their inputs; this library entry
    // point cannot assume its caller did).
    val rows = df
      .filter(col(embedCol).isNotNull && size(col(embedCol)) >= dims)
      .select(col(embedCol).cast("array<double>").as("v"))
      .rdd.map(_.getSeq[Double](0))
    val (acc, n) = rows.treeAggregate((new Array[Double](packedLen), 0L))(
      seqOp = { case ((a, c), v) =>
        var k = 0
        var i = 0
        while (i < dims) {
          val vi = v(i)
          var j = i
          while (j < dims) { a(k) += vi * v(j); k += 1; j += 1 }
          i += 1
        }
        (a, c + 1)
      },
      combOp = { case ((a, ca), (b, cb)) =>
        var k = 0
        while (k < packedLen) { a(k) += b(k); k += 1 }
        (a, ca + cb)
      })
    require(n > 0, "secondMoment of an empty embedding set")
    val m = Array.ofDim[Double](dims, dims)
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val v = acc(k) / n
        m(i)(j) = v
        m(j)(i) = v
        k += 1
        j += 1
      }
      i += 1
    }
    m
  }

  /** Dominant eigenvector + eigenvalue of a small symmetric PSD matrix
    * by power iteration (deterministic uniform start, sign fixed so the
    * first nonzero coordinate is positive).
    */
  def topComponent(m: Array[Array[Double]], iters: Int = 100): (Array[Double], Double) = {
    val d = m.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var norm2 = 0.0
      var k = 0
      while (k < d) { norm2 += w(k) * w(k); k += 1 }
      val norm = math.sqrt(norm2)
      if (norm == 0.0) return (v, 0.0) // degenerate: M annihilates v
      var p = 0
      while (p < d) { w(p) /= norm; p += 1 }
      v = w
      lambda = norm
      it += 1
    }
    val firstNonZero = v.indexWhere(_ != 0.0)
    if (firstNonZero >= 0 && v(firstNonZero) < 0.0) {
      var i = 0
      while (i < v.length) { v(i) = -v(i); i += 1 }
    }
    (v, lambda)
  }

  /** Projection of an embedding column onto a component — the codegen'd
    * dot product against the broadcast literal direction.
    */
  def project(embedCol: Column, component: Array[Double]): Column =
    GraftPlanBridge.column(DotProduct(
      GraftPlanBridge.expr(VectorFunctions.asDouble(embedCol)),
      GraftPlanBridge.expr(lit(component))))
}
