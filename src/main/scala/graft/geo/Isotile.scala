package graft.geo

/** Gridded isochrone contours — the Valhalla isotile construction
  * (reference surface: valhalla-wrapper/src/wrapper.cpp:323-383, whose
  * actor builds contours from a regular grid of arrival times, not from a
  * point-cloud hull): rasterize the settled Dijkstra cost field onto a
  * regular lon/lat grid, threshold at the contour budget, and trace the
  * boundary of the inside-cell union as closed rings (marching squares on
  * the thresholded field). Replaces the k-NN concave hull
  * ([[Hull.concave]]) for isochrone output: a hull is a heuristic over
  * the reachable CLOUD, while the isotile contour is exact over the
  * reachable CELLS — every budget-satisfying settled node lies inside
  * (it marks its cell), every unreached sample outside (its cell stays
  * unmarked), including pockets and notches a k-NN walk can smooth over
  * (ContourSpec pins both).
  *
  * Output is GeoJSON polygon nesting: outer rings counterclockwise,
  * holes clockwise, each hole attached to the outer ring containing it.
  * Cost is O(settled + cells) — one pass to mark, one boundary walk; no
  * k-NN search, no sort.
  */
object Isotile {

  private final case class E(fx: Int, fy: Int, tx: Int, ty: Int)

  /** Trace the iso-contour at `cutMs` over settled samples
    * `(lon, lat, costMs)`. Returns polygons as GeoJSON coordinate
    * nesting: Seq(polygon -> Seq(ring -> Seq(lon, lat))), ring 0 the
    * outer shell, rings 1+ its holes. `nCells` is the grid resolution of
    * the LONGER bbox side (the shorter side scales by aspect); the grid
    * is anchored so sample extremes sit at cell centers, which makes a
    * uniform lattice fixture align cell-per-node when nCells matches its
    * node count per side.
    */
  def contours(pts: Seq[(Double, Double, Long)], cutMs: Long,
               nCells: Int = 128): Seq[Seq[Seq[(Double, Double)]]] = {
    val in = pts.filter(_._3 <= cutMs)
    if (in.isEmpty) return Nil
    var minX = Double.MaxValue; var maxX = Double.MinValue
    var minY = Double.MaxValue; var maxY = Double.MinValue
    pts.foreach { case (x, y, _) =>
      if (x < minX) minX = x
      if (x > maxX) maxX = x
      if (y < minY) minY = y
      if (y > maxY) maxY = y
    }
    val spanX = math.max(maxX - minX, 1e-9)
    val spanY = math.max(maxY - minY, 1e-9)
    val longSide = math.max(spanX, spanY)
    val nx = math.max(1, math.round(nCells * spanX / longSide).toInt)
    val ny = math.max(1, math.round(nCells * spanY / longSide).toInt)
    val dx = spanX / nx
    val dy = spanY / ny
    // anchor: extremes at cell centers -> grid origin half a cell below min
    val x0 = minX - dx / 2
    val y0 = minY - dy / 2
    val gw = nx + 1 // cells per row (both extremes included)
    val gh = ny + 1
    val inside = new Array[Boolean](gw * gh)
    in.foreach { case (x, y, _) =>
      val i = math.min(gw - 1, math.max(0, ((x - x0) / dx).toInt))
      val j = math.min(gh - 1, math.max(0, ((y - y0) / dy).toInt))
      inside(j * gw + i) = true
    }
    def cell(i: Int, j: Int): Boolean =
      i >= 0 && i < gw && j >= 0 && j < gh && inside(j * gw + i)

    // Directed boundary edges on grid corners with the interior to the
    // LEFT of travel: outer boundaries come out counterclockwise, holes
    // clockwise. Corner (i, j) = (x0 + i·dx, y0 + j·dy).
    val edges = scala.collection.mutable.ArrayBuffer[E]()
    var j = 0
    while (j < gh) {
      var i = 0
      while (i < gw) {
        if (cell(i, j)) {
          if (!cell(i, j - 1)) edges += E(i, j, i + 1, j)         // bottom ->
          if (!cell(i + 1, j)) edges += E(i + 1, j, i + 1, j + 1) // right  ^
          if (!cell(i, j + 1)) edges += E(i + 1, j + 1, i, j + 1) // top    <-
          if (!cell(i - 1, j)) edges += E(i, j + 1, i, j)         // left   v
        }
        i += 1
      }
      j += 1
    }

    // stitch directed edges into closed rings; at a corner where two
    // inside cells touch diagonally two edges start — take the sharpest
    // left turn relative to the incoming direction so each loop stays on
    // its own component and never pinches through the corner
    val byStart = scala.collection.mutable.HashMap[(Int, Int), List[E]]()
    edges.foreach(e => byStart((e.fx, e.fy)) = e :: byStart.getOrElse((e.fx, e.fy), Nil))
    def takeEdge(e: E): Unit = {
      val k = (e.fx, e.fy)
      byStart(k).filterNot(_ == e) match {
        case Nil  => byStart.remove(k)
        case rest => byStart(k) = rest
      }
    }
    val rings = scala.collection.mutable.ArrayBuffer[Vector[(Int, Int)]]()
    while (byStart.nonEmpty) {
      val first = byStart(byStart.keysIterator.next()).head
      takeEdge(first)
      var ring = Vector[(Int, Int)]((first.fx, first.fy))
      var cur = first
      var closed = false
      while (!closed) {
        val at = (cur.tx, cur.ty)
        ring :+= at
        if (at == ring.head) closed = true
        else {
          val cands = byStart.getOrElse(at, Nil)
          require(cands.nonEmpty, "open boundary: edge generation bug")
          val next =
            if (cands.lengthCompare(1) == 0) cands.head
            else {
              val dx0 = cur.tx - cur.fx; val dy0 = cur.ty - cur.fy
              cands.maxBy(e => dx0 * (e.ty - e.fy) - dy0 * (e.tx - e.fx))
            }
          takeEdge(next)
          cur = next
        }
      }
      rings += ring
    }

    def toLonLat(p: (Int, Int)): (Double, Double) = (x0 + p._1 * dx, y0 + p._2 * dy)
    def signedArea2(r: Vector[(Int, Int)]): Long = {
      var a = 0L
      var k = 0
      while (k < r.length - 1) {
        a += r(k)._1.toLong * r(k + 1)._2 - r(k + 1)._1.toLong * r(k)._2
        k += 1
      }
      a
    }
    val outers = scala.collection.mutable.ArrayBuffer[
      (Vector[(Int, Int)], scala.collection.mutable.ArrayBuffer[Vector[(Int, Int)]])]()
    val holes = scala.collection.mutable.ArrayBuffer[Vector[(Int, Int)]]()
    rings.foreach { r =>
      if (signedArea2(r) > 0) outers += ((r, scala.collection.mutable.ArrayBuffer()))
      else holes += r
    }
    // attach each hole to the outer ring containing a point just inside
    // the hole loop: midpoint of its first edge nudged right of travel (a
    // clockwise loop encloses the region to its right). The nudge is a
    // quarter cell, so it cannot cross another boundary edge. With nested
    // geometry (island inside a lake inside the region) the point lies in
    // SEVERAL outer rings — the hole belongs to the INNERMOST containing
    // one, i.e. the smallest by area (each ring's even-odd test ignores
    // the others, so `find` on discovery order could pick the outermost).
    holes.foreach { h =>
      val f = h(0); val t = h(1)
      val mx = (f._1 + t._1) / 2.0 + (t._2 - f._2) * 0.25
      val my = (f._2 + t._2) / 2.0 - (t._1 - f._1) * 0.25
      val containing = outers.filter(o => pointInIntRing(mx, my, o._1))
      if (containing.nonEmpty)
        containing.minBy(o => signedArea2(o._1))._2 += h
    }
    outers.toSeq.map { case (o, hs) =>
      o.map(toLonLat) +: hs.toSeq.map(_.map(toLonLat))
    }
  }

  /** Even-odd point-in-ring over an integer grid ring; the test point is
    * a nudged midpoint, never on a vertex or an edge.
    */
  private def pointInIntRing(px: Double, py: Double,
                             ring: Vector[(Int, Int)]): Boolean = {
    var inR = false
    var k = 0
    while (k < ring.length - 1) {
      val y1 = ring(k)._2.toDouble; val y2 = ring(k + 1)._2.toDouble
      if ((y1 > py) != (y2 > py)) {
        val x1 = ring(k)._1.toDouble; val x2 = ring(k + 1)._1.toDouble
        val xc = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
        if (px < xc) inR = !inR
      }
      k += 1
    }
    inR
  }
}
