package graft

import graft.functions.Geo
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GeoSpec extends SparkSuite {

  private def hav(pts: Seq[(Double, Double, Double, Double)]): Seq[Double] = {
    import spark.implicits._
    pts.toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .collect().toSeq.map(_.getDouble(0))
  }

  test("Paris to London is ~343.5 km") {
    val d = hav(Seq((48.8566, 2.3522, 51.5074, -0.1278))).head
    assert(math.abs(d - 343.5) < 1.0, s"got $d")
  }

  test("zero at identity") {
    assert(hav(Seq((45.0, 7.0, 45.0, 7.0))).head == 0.0)
  }

  test("one degree of latitude is ~111.2 km") {
    val d = hav(Seq((10.0, 20.0, 11.0, 20.0))).head
    assert(math.abs(d - 111.19) < 0.1, s"got $d")
  }

  test("symmetric and non-negative on generated coordinates") {
    val coord = for {
      lat <- Gen.choose(-89.0, 89.0)
      lon <- Gen.choose(-179.0, 179.0)
    } yield (lat, lon)
    val pairs = Gen.listOfN(25, Gen.zip(coord, coord))
      .apply(Gen.Parameters.default, Seed(42L)).get
    val fwd = hav(pairs.map { case ((a, b), (c, d)) => (a, b, c, d) })
    val rev = hav(pairs.map { case ((a, b), (c, d)) => (c, d, a, b) })
    fwd.zip(rev).foreach { case (d12, d21) =>
      assert(d12 >= 0.0)
      assert(math.abs(d12 - d21) < 1e-9)
    }
  }
}
