package graft.geo

/** WKT (well-known text) parser/writer.
  *
  * Covers the geometry classes the reference accepts as routing input
  * (reference: valhalla-wrapper/src/wrapper.cpp:46-70 POINT-only C++ path;
  * rust/src/lib.rs:299-337 full-geometry centroid path). Coordinates are
  * (lon, lat), WKT axis order.
  */
object Wkt {

  def writePoint(lon: Double, lat: Double): String = s"POINT($lon $lat)"

  def writeLineString(points: Seq[(Double, Double)]): String =
    points.map { case (lon, lat) => s"$lon $lat" }.mkString("LINESTRING(", ", ", ")")

  /** Parse any supported WKT and return its centroid (lon, lat).
    * POINT → itself; LINESTRING, POLYGON, MULTI-geometries and collections →
    * vertex average (matching the reference's centroid-as-anchor convention).
    */
  def centroid(wkt: String): Option[(Double, Double)] = {
    val pts = points(wkt)
    if (pts.isEmpty) None
    else Some((pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length))
  }

  /** Parse a WKT POINT strictly. */
  def readPoint(wkt: String): Option[(Double, Double)] = {
    if (wkt == null) return None
    val s = wkt.trim
    if (!s.toUpperCase.startsWith("POINT")) return None
    parseCoordList(s.substring(5)).flatMap(_.headOption)
  }

  /** All coordinates of any WKT geometry, flattened. */
  def points(wkt: String): Array[(Double, Double)] = {
    if (wkt == null) return Array.empty
    val s = wkt.trim
    val upper = s.toUpperCase
    val body = upper.indexOf('(')
    if (body < 0) return Array.empty
    // strip the type tag; then extract every `num num` pair left-to-right.
    // This is robust across nesting depth (POLYGON((..)), MULTI*, collections).
    val nums = NumPair.findAllMatchIn(s.substring(body)).map { m =>
      (m.group(1).toDouble, m.group(2).toDouble)
    }.toArray
    nums
  }

  private val NumPair =
    """(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s+(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)""".r

  private def parseCoordList(rest: String): Option[Array[(Double, Double)]] = {
    val t = rest.trim
    if (!t.startsWith("(") || !t.endsWith(")")) return None
    val inner = t.substring(1, t.length - 1)
    try {
      val pts = inner.split(",").map { pair =>
        val xs = pair.trim.split("\\s+")
        (xs(0).toDouble, xs(1).toDouble)
      }
      Some(pts)
    } catch { case _: Exception => None }
  }
}
