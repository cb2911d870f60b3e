package graft.geo

/** Pure geodesy helpers.
  *
  * Semantics follow the reference engine's use of the Rust `geo` crate's
  * haversine distance (reference: rust/src/lib.rs:204,574,794) — mean earth
  * radius 6371008.8 m (the `geo` crate's MEAN_EARTH_RADIUS).
  */
object Geo {
  final val MeanEarthRadiusM: Double = 6371008.8

  def haversineM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2.0 * MeanEarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Squared equirectangular approximation in degrees, scaled by cos(lat) —
    * cheap comparable metric for nearest-neighbor search (exact ordering is
    * refined with haversine by callers that need it).
    */
  def approxDist2(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = lat2 - lat1
    val dLon = (lon2 - lon1) * math.cos(math.toRadians((lat1 + lat2) * 0.5))
    dLat * dLat + dLon * dLon
  }
}
