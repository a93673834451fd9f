package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Great-circle geometry composed from built-in Column expressions.
  *
  * Semantics follow the reference's Haversine implementation
  * (reference scripts/08_load_driver_risk_scores.py:55-80): it composes
  * built-in trig functions only, so the whole thing stays inside
  * whole-stage codegen — no UDF, no serialization boundary, identical
  * at 100 TB as at test scale.
  */
object Geo {
  val EarthRadiusKm: Double = 6371.0

  /** Haversine great-circle distance in km between (lat1,lon1) and (lat2,lon2),
    * all in decimal degrees. a = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2);
    * d = 2R·atan2(√a, √(1−a)).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Same formula on plain doubles — for stateful streaming code that
    * runs inside typed group functions rather than expression trees.
    */
  def haversineKmScalar(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusKm * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
  }
}
