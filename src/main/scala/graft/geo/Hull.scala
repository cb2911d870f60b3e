package graft.geo

/** Convex hull (Andrew's monotone chain) over (lon, lat) points.
  *
  * Backs the isochrone contour surface: the reference's Valhalla path emits
  * polygon contours (valhalla-wrapper/src/wrapper.cpp:323-383, GeoJSON);
  * we produce convex contours from the reachable-node cloud — a documented
  * divergence (Valhalla contours are concave) that preserves the output
  * shape and format.
  */
object Hull {

  /** Hull vertices in counter-clockwise order, closed (first == last) when
    * input has ≥3 distinct points; degenerate inputs return what they can.
    */
  def convex(points: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    val pts = points.distinct.sortBy(p => (p._1, p._2))
    if (pts.length < 3) return pts
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(ps: Seq[(Double, Double)]): Seq[(Double, Double)] = {
      val h = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      ps.foreach { p =>
        while (h.length >= 2 && cross(h(h.length - 2), h(h.length - 1), p) <= 0)
          h.remove(h.length - 1)
        h += p
      }
      h.toSeq
    }
    val lower = half(pts)
    val upper = half(pts.reverse)
    val ring = (lower.dropRight(1) ++ upper.dropRight(1))
    ring :+ ring.head
  }
}
