package graft.geo

/** Hulls over (lon, lat) points.
  *
  * Backs the isochrone contour surface: the reference's Valhalla path emits
  * concave polygon contours (valhalla-wrapper/src/wrapper.cpp:323-383,
  * GeoJSON). [[concave]] (k-nearest-neighbours, Moreira & Santos 2007)
  * matches that semantics over the reachable-node cloud; [[convex]]
  * (Andrew's monotone chain) remains as the degenerate-input fallback and
  * for callers that want the cheap over-approximation.
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

  /** Grid-snap thinning: one representative point per cell of a g×g grid
    * over the bbox. Bounds the concave-hull walk's O(n·h·k) cost on huge
    * reachable clouds (a city-scale isochrone can be 100k+ nodes) while
    * preserving boundary shape at ~1/g of the bbox span — finer than any
    * plausible contour rendering. No-op at or under `maxPoints`.
    */
  def thin(points: Seq[(Double, Double)], maxPoints: Int = 4000): Seq[(Double, Double)] = {
    if (points.length <= maxPoints) return points
    val g = math.max(8, math.sqrt(maxPoints.toDouble).toInt)
    var minX = Double.MaxValue; var maxX = -Double.MaxValue
    var minY = Double.MaxValue; var maxY = -Double.MaxValue
    points.foreach { p =>
      if (p._1 < minX) minX = p._1; if (p._1 > maxX) maxX = p._1
      if (p._2 < minY) minY = p._2; if (p._2 > maxY) maxY = p._2
    }
    val sx = math.max(1e-12, (maxX - minX) / g)
    val sy = math.max(1e-12, (maxY - minY) / g)
    val seen = new java.util.HashSet[Long]()
    val out = Seq.newBuilder[(Double, Double)]
    points.foreach { p =>
      val cx = math.min(g - 1, ((p._1 - minX) / sx).toInt)
      val cy = math.min(g - 1, ((p._2 - minY) / sy).toInt)
      if (seen.add(cx.toLong * g + cy)) out += p
    }
    out.result()
  }

  /** Concave hull by k-nearest-neighbours boundary walk (Moreira & Santos,
    * GRAPP 2007). Walks the boundary counter-clockwise from the lowest
    * point, at each step choosing among the k nearest unused points the one
    * making the sharpest clockwise turn whose segment does not cross the
    * hull built so far. If the walk dead-ends or leaves input points
    * outside, retries with larger k; falls back to [[convex]] once k
    * exceeds the cloud size. Closed ring (first == last).
    *
    * O(n·h·k) per call with h boundary vertices — per-row cost on
    * executor-side isochrone clouds (thousands of nodes), not a
    * distributed concern.
    */
  def concave(points: Seq[(Double, Double)], k: Int = 8): Seq[(Double, Double)] = {
    val pts = points.distinct
    if (pts.length < 4) return convex(pts)
    var kk = math.max(3, k)
    while (kk < pts.length) {
      walk(pts.toArray, kk) match {
        case Some(ring) => return ring
        case None       => kk = kk * 2 // more neighbours → less concave, more robust
      }
    }
    convex(pts)
  }

  private def walk(pts: Array[(Double, Double)], k: Int): Option[Seq[(Double, Double)]] = {
    val n = pts.length
    val used = new Array[Boolean](n)
    val start = (0 until n).minBy(i => (pts(i)._2, pts(i)._1)) // lowest, then leftmost
    val hull = scala.collection.mutable.ArrayBuffer[Int](start)
    used(start) = true
    var cur = start
    var prevAngle = 0.0 // incoming direction; first step sweeps from due east
    var steps = 0
    while ((hull.length < 2 || cur != start) && steps < 4 * n) {
      steps += 1
      if (hull.length == 3) used(start) = false // allow closing the ring
      // k nearest unused by partial selection (no full sort per step)
      val selIdx = new Array[Int](k); val selD = new Array[Double](k)
      var selN = 0
      var m = 0
      while (m < n) {
        if (!used(m) && m != cur) {
          val d = dist2(pts(cur), pts(m))
          if (selN < k) {
            var p = selN - 1
            selIdx(selN) = m; selD(selN) = d; selN += 1
            while (p >= 0 && selD(p) > selD(p + 1)) {
              val ti = selIdx(p); selIdx(p) = selIdx(p + 1); selIdx(p + 1) = ti
              val td = selD(p); selD(p) = selD(p + 1); selD(p + 1) = td
              p -= 1
            }
          } else if (d < selD(k - 1)) {
            selIdx(k - 1) = m; selD(k - 1) = d
            var p = k - 2
            while (p >= 0 && selD(p) > selD(p + 1)) {
              val ti = selIdx(p); selIdx(p) = selIdx(p + 1); selIdx(p + 1) = ti
              val td = selD(p); selD(p) = selD(p + 1); selD(p + 1) = td
              p -= 1
            }
          }
        }
        m += 1
      }
      val cands = selIdx.take(selN)
        // sharpest clockwise turn relative to the incoming edge direction
        .sortBy(i => -turnAngle(prevAngle, pts(cur), pts(i))).toIndexedSeq
      // a point lying strictly between cur and a candidate is necessarily
      // NEARER to cur than that candidate — so the collinear jump-over
      // check below only needs points within the farthest candidate's
      // radius (one O(n) pass per step, not per candidate)
      val maxD2 = if (cands.isEmpty) 0.0 else cands.iterator.map(i => dist2(pts(cur), pts(i))).max
      val near = (0 until n).filter(m => m != cur && dist2(pts(cur), pts(m)) <= maxD2)
      val next = cands.find { i =>
        val seg = (pts(cur), pts(i))
        // reject segments crossing the existing boundary (ignore the edges
        // sharing the current endpoint, and the start point when closing)
        val lastCheck = if (i == start) hull.length - 2 else hull.length - 1
        !(1 until lastCheck).exists { j =>
          segmentsCross(seg._1, seg._2, pts(hull(j - 1)), pts(hull(j)))
        } &&
          // reject steps that jump over a collinear cloud point: proper-
          // crossing can't see collinear overlap, so without this the walk
          // closes early straight through an existing edge (e.g. back along
          // a grid row). Also keeps boundary steps tight.
          !near.exists(m => m != i && between(pts(cur), pts(i), pts(m)))
      }
      next match {
        case None => return None // dead end: need larger k
        case Some(i) =>
          if (i == start) {
            hull += start
            cur = start
          } else {
            prevAngle = math.atan2(pts(cur)._2 - pts(i)._2, pts(cur)._1 - pts(i)._1)
            hull += i
            used(i) = true
            cur = i
          }
      }
    }
    if (cur != start) return None
    val ring = hull.map(pts).toSeq
    // every input point must be inside or on the ring, else retry
    val allCovered = (0 until n).forall { i =>
      used(i) || pointInRing(pts(i), ring) || onRing(pts(i), ring)
    }
    if (allCovered) Some(ring) else None
  }

  private def dist2(a: (Double, Double), b: (Double, Double)): Double = {
    val dx = a._1 - b._1; val dy = a._2 - b._2; dx * dx + dy * dy
  }

  /** Clockwise sweep angle in (0, 2π] from the reversed incoming direction
    * to candidate c — the Moreira-Santos "largest right-hand turn".
    */
  private def turnAngle(prevAngle: Double, cur: (Double, Double), c: (Double, Double)): Double = {
    val a = math.atan2(c._2 - cur._2, c._1 - cur._1)
    var d = prevAngle - a
    while (d <= 0) d += 2 * math.Pi
    while (d > 2 * math.Pi) d -= 2 * math.Pi
    d
  }

  /** p lies strictly between a and b on the segment (collinear interior). */
  private def between(a: (Double, Double), b: (Double, Double), p: (Double, Double)): Boolean =
    math.abs(orient(a, b, p)) < 1e-12 &&
      p._1 > math.min(a._1, b._1) - 1e-12 && p._1 < math.max(a._1, b._1) + 1e-12 &&
      p._2 > math.min(a._2, b._2) - 1e-12 && p._2 < math.max(a._2, b._2) + 1e-12 &&
      p != a && p != b

  private def orient(a: (Double, Double), b: (Double, Double), c: (Double, Double)): Double =
    (b._1 - a._1) * (c._2 - a._2) - (b._2 - a._2) * (c._1 - a._1)

  /** Proper crossing of open segments ab and cd (shared endpoints excluded). */
  private def segmentsCross(a: (Double, Double), b: (Double, Double),
                            c: (Double, Double), d: (Double, Double)): Boolean = {
    if (a == c || a == d || b == c || b == d) return false
    val d1 = orient(c, d, a); val d2 = orient(c, d, b)
    val d3 = orient(a, b, c); val d4 = orient(a, b, d)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  /** Ray-cast point-in-polygon over a closed ring. */
  def pointInRing(p: (Double, Double), ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    var j = ring.length - 2
    var i = 0
    while (i < ring.length - 1) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > p._2) != (yj > p._2) &&
          p._1 < (xj - xi) * (p._2 - yi) / (yj - yi) + xi) inside = !inside
      j = i; i += 1
    }
    inside
  }

  private def onRing(p: (Double, Double), ring: Seq[(Double, Double)]): Boolean =
    ring.contains(p) || (0 until ring.length - 1).exists { i =>
      val a = ring(i); val b = ring(i + 1)
      math.abs(orient(a, b, p)) < 1e-12 &&
        p._1 >= math.min(a._1, b._1) - 1e-12 && p._1 <= math.max(a._1, b._1) + 1e-12 &&
        p._2 >= math.min(a._2, b._2) - 1e-12 && p._2 <= math.max(a._2, b._2) + 1e-12
    }
}
