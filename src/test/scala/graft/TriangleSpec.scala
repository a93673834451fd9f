package graft

import graft.ops.DedupClusters
import org.apache.spark.sql.functions._

/** Degree-oriented triangle census (q111's kernel): correctness against
  * a brute-force enumerator on crafted graphs, and the scale property
  * the orientation exists for — wedge fan-out on a star graph is
  * bounded by the SMALL-degree side, not the hub's degree.
  */
class TriangleSpec extends SparkSuite {
  import spark.implicits._

  private def df(edges: Seq[(Long, Long)]) =
    edges.toDF("src", "dst")

  /** Brute-force per-node triangle counts over an id-oriented edge list. */
  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val es = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = nodes.map(n => n ->
      edges.count(e => e._1 == n || e._2 == n).toLong).toMap
    def adj(a: Long, b: Long) = es((a min b, a max b))
    val tris = for {
      a <- nodes; b <- nodes if a < b && adj(a, b)
      c <- nodes if b < c && adj(b, c) && adj(a, c)
    } yield (a, b, c)
    val tcnt = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    nodes.map(n => n -> (deg(n), tcnt.getOrElse(n, 0L))).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val got = DedupClusters.triangleCounts(df(edges)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == bruteForce(edges))
  }

  test("census matches brute force on crafted graphs") {
    // two triangles sharing edge (2,3), a pendant, a square (no triangle)
    check(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (8L, 9L), (6L, 9L)))
    // K4: every node in 3 triangles
    check(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // hub with a closed fan: spokes chained pairwise
    check(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L), (3L, 4L)))
  }

  test("census matches brute force on seeded random graphs") {
    // Erdős–Rényi-ish graphs hit orientation edge cases crafted graphs
    // miss: degree ties resolved by id, wedges whose closing edge is
    // oriented either way, multi-triangle nodes. One Spark job per
    // graph, so keep the count modest.
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val n = 8 + rnd.nextInt(6)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      if (edges.nonEmpty) check(edges)
    }
  }

  test("degree orientation bounds star-graph wedge fan-out by the spoke side") {
    val n = 40L
    // id-orientation would put the hub (id 0) as every edge's source:
    // C(40,2) = 780 wedges on one join key. Degree orientation points
    // every edge spoke→hub (spoke degree 1 < hub degree 40), so each
    // spoke's out-degree is 1 and the wedge join produces NOTHING.
    val star = df((1L to n).map(i => (0L, i)))
    val oriented = DedupClusters.orientEdges(star)
    assert(oriented.filter(col("src") === 0L).count() == 0L,
      "hub must not be a wedge center")
    assert(DedupClusters.wedges(oriented).count() == 0L)
    // and with one spoke-spoke edge closing a triangle through the hub,
    // the only wedge sits at the degree-2 corner — fan-out stays O(1)
    val starPlus = df((1L to n).map(i => (0L, i)) :+ (1L, 2L))
    val w = DedupClusters.wedges(DedupClusters.orientEdges(starPlus))
    assert(w.count() == 1L)
    check((1L to n).map(i => (0L, i)) :+ (1L, 2L))
  }
}
