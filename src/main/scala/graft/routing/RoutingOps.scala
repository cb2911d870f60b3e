package graft.routing

import graft.algo.Dijkstra
import graft.geo.{Geo, Wkb, Wkt}
import graft.graph.PreparedGraph

/** Result types — Spark maps these case classes to STRUCT columns, mirroring
  * the reference's declared return types (src/travel_time_extension.cpp:899-935).
  */
final case class Route(distance_km: Double, duration_minutes: Double, geometry: Array[Byte])
final case class SnappedPoint(lat: Double, lon: Double)
final case class SnapResult(lat: Double, lon: Double, distance_m: Double)
final case class MatrixEntry(from_idx: Int, to_idx: Int, distance_m: Double, duration_s: Double)
final case class IsoNode(lat: Double, lon: Double, seconds: Double)

/** One input trace point after map-matching: snapped coordinates, snap
  * distance, and whether a graph node was found at all.
  */
final case class TracePoint(lat: Double, lon: Double, distance_m: Double,
                            shape_index: Int, ok: Boolean)

/** One traversed graph edge of the matched path (trace_attributes shape:
  * Valhalla's `edges[]` carries length/speed/shape-index spans).
  */
final case class TraceEdge(length_km: Double, speed_kph: Double,
                           weight_s: Double, begin_shape_index: Int, end_shape_index: Int)

/** A GPS trace matched to the graph: concatenated node path, totals, the
  * per-input-point matches, and per-edge attributes.
  */
final case class TraceMatch(pathNodes: Array[Int], totalMs: Long, totalDistM: Double,
                            points: Seq[TracePoint], edges: Seq[TraceEdge])

/** Row-level routing kernels over a prepared graph. Pure functions of
  * (graph, inputs) — every entry point takes the graph explicitly so callers
  * (UDFs, mapPartitions) control state placement.
  */
object RoutingOps {

  private def calc(g: PreparedGraph): Dijkstra = Routers.calculator(g)

  /** Point-to-point duration in seconds; None when either endpoint fails to
    * snap or no path exists (reference NULL semantics,
    * src/travel_time_extension.cpp:512-513).
    */
  def travelTimeSeconds(g: PreparedGraph, lat1: Double, lon1: Double,
                        lat2: Double, lon2: Double): Option[Double] = {
    val s = g.snap(lat1, lon1); val t = g.snap(lat2, lon2)
    if (s < 0 || t < 0) return None
    // CH-accelerated when the graph carries a prepared hierarchy;
    // bidirectional Dijkstra otherwise
    val ms = Routers.chQuery(g) match {
      case Some(q) => q.shortestPathMs(s, t)
      case None    => Routers.biCalculator(g).shortestPathMs(s, t)
    }
    if (ms < 0) None else Some(ms / 1000.0)
  }

  /** Full route: distance (haversine along path nodes, rust/src/lib.rs:789-795),
    * duration, and WKB LINESTRING geometry
    * (reference: src/travel_time_extension.cpp:618-689).
    */
  def route(g: PreparedGraph, fromLonLat: (Double, Double),
            toLonLat: (Double, Double)): Option[Route] = {
    val s = g.snap(fromLonLat._2, fromLonLat._1)
    val t = g.snap(toLonLat._2, toLonLat._1)
    if (s < 0 || t < 0) return None
    calc(g).shortestPathWithNodes(s, t).map { case (ms, path) =>
      val distM = calc(g).pathDistanceM(path)
      val pts = path.map(i => (g.nodeLon(i), g.nodeLat(i))).toSeq
      Route(distM / 1000.0, ms / 60000.0, Wkb.writeLineString(pts))
    }
  }

  /** Route avoiding blocked road points — Valhalla's `exclude_locations`
    * option on the route action: each exclusion snaps to its nearest node
    * and the search never enters it (endpoints exempt; an exclusion that
    * snaps onto an endpoint is ignored rather than making the request
    * unroutable). Empty exclusion list delegates to the plain
    * (CH-accelerated) [[route]] — the probe-carrying search only runs when
    * a request actually excludes something.
    */
  def routeAvoiding(g: PreparedGraph, fromLonLat: (Double, Double),
                    toLonLat: (Double, Double),
                    excludeLatLons: Seq[(Double, Double)]): Option[Route] = {
    if (excludeLatLons.isEmpty) return route(g, fromLonLat, toLonLat)
    val s = g.snap(fromLonLat._2, fromLonLat._1)
    val t = g.snap(toLonLat._2, toLonLat._1)
    if (s < 0 || t < 0) return None
    val blocked = new java.util.HashSet[Integer]()
    excludeLatLons.foreach { case (lat, lon) =>
      val b = g.snap(lat, lon)
      if (b >= 0 && b != s && b != t) blocked.add(b)
    }
    calc(g).shortestPathWithNodesAvoiding(s, t, blocked).map { case (ms, path) =>
      val distM = calc(g).pathDistanceM(path)
      val pts = path.map(i => (g.nodeLon(i), g.nodeLat(i))).toSeq
      Route(distM / 1000.0, ms / 60000.0, Wkb.writeLineString(pts))
    }
  }

  /** Route with WKT/WKB-polymorphic endpoints: strings are parsed as WKT,
    * byte arrays as WKB; any geometry routes from its centroid
    * (reference input dispatch: src/travel_time_extension.cpp:227-385).
    */
  def routeAny(g: PreparedGraph, from: AnyRef, to: AnyRef): Option[Route] =
    for {
      f <- anchorOf(from)
      t <- anchorOf(to)
      r <- route(g, f, t)
    } yield r

  /** (lon, lat) anchor of a WKT string or WKB blob. Non-WKB bytes fall back
    * to UTF-8 WKT — the host engine casts VARCHAR→BLOB preserving bytes, so
    * `travel_time_route_wkb('POINT(…)', …)` must route exactly as the
    * reference's own test does (test/sql/monaco_routing.test:23-29).
    */
  def anchorOf(v: AnyRef): Option[(Double, Double)] = v match {
    case null            => None
    case s: String       => Wkt.centroid(s)
    case b: Array[Byte]  =>
      if (Wkb.looksLikeWkb(b)) Wkb.centroid(b)
      else Wkt.centroid(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    case _               => None
  }

  def locate(g: PreparedGraph, lat: Double, lon: Double): Option[SnappedPoint] = {
    val i = g.snap(lat, lon)
    if (i < 0) None else Some(SnappedPoint(g.nodeLat(i), g.nodeLon(i)))
  }

  /** Legacy-rich snap with distance (test/sql/z_integration.test.skip:33-40). */
  def snap(g: PreparedGraph, lat: Double, lon: Double): Option[SnapResult] =
    g.snapWithDistance(lat, lon).map { case (i, d) =>
      SnapResult(g.nodeLat(i), g.nodeLon(i), d)
    }

  /** N×M matrix from coordinate arrays; one one-to-many traversal per source.
    * Unreachable cells are -1 (valhalla-wrapper/src/wrapper.cpp:308-310).
    */
  def matrixEntries(g: PreparedGraph,
                    srcLats: Seq[Double], srcLons: Seq[Double],
                    dstLats: Seq[Double], dstLons: Seq[Double]): Seq[MatrixEntry] = {
    require(srcLats.length == srcLons.length && dstLats.length == dstLons.length,
      "Source and destination coordinate arrays must have matching lengths " +
        "(reference: src/travel_time_extension.cpp:793-806)")
    val d = calc(g)
    val dstNodes = dstLats.indices.map(i => g.snap(dstLats(i), dstLons(i))).toArray
    srcLats.indices.flatMap { si =>
      val s = g.snap(srcLats(si), srcLons(si))
      val row = d.oneToMany(s, dstNodes)
      row.indices.map { di =>
        val (ms, m) = row(di)
        if (ms < 0) MatrixEntry(si, di, -1.0, -1.0)
        else MatrixEntry(si, di, m, ms / 1000.0)
      }
    }
  }

  /** All nodes reachable within maxSeconds (reference: rust/src/lib.rs:639-720). */
  def isochrone(g: PreparedGraph, lat: Double, lon: Double,
                maxSeconds: Double): Seq[IsoNode] = {
    val s = g.snap(lat, lon)
    if (s < 0) return Nil
    calc(g).reachableWithin(s, (maxSeconds * 1000).toLong).toSeq.map { case (n, ms) =>
      IsoNode(g.nodeLat(n), g.nodeLon(n), ms / 1000.0)
    }
  }

  /** Map-match a GPS trace to the graph: snap every input point to its
    * nearest graph node, then stitch the matched path as shortest paths
    * between consecutive distinct snapped nodes (snap-and-route matching —
    * the semantics the reference surfaces through Valhalla's
    * `trace_route`/`trace_attributes` actions,
    * valhalla-wrapper/src/wrapper.cpp:439-443; Valhalla's matcher is
    * HMM-based, ours is nearest-snap + shortest-path interpolation, exact on
    * traces whose points lie near the true path).
    *
    * Returns None when no point snaps or a leg between matched points is
    * disconnected (the error channel the wrapper maps to NULL).
    */
  def traceMatch(g: PreparedGraph, pts: Seq[(Double, Double)]): Option[TraceMatch] = {
    if (pts.isEmpty) return None
    val d = calc(g)
    val points = pts.zipWithIndex.map { case ((lat, lon), i) =>
      g.snapWithDistance(lat, lon) match {
        case Some((n, distM)) => (n, TracePoint(g.nodeLat(n), g.nodeLon(n), distM, i, ok = true))
        case None             => (-1, TracePoint(lat, lon, -1.0, i, ok = false))
      }
    }
    val snapped = points.collect { case (n, _) if n >= 0 => n }
    if (snapped.isEmpty) return None
    // consecutive distinct matched nodes define the legs
    val legNodes = snapped.foldLeft(Vector.empty[Int]) {
      (acc, n) => if (acc.lastOption.contains(n)) acc else acc :+ n
    }
    var totalMs = 0L
    val path = scala.collection.mutable.ArrayBuffer[Int](legNodes.head)
    var i = 0
    while (i < legNodes.length - 1) {
      d.shortestPathWithNodes(legNodes(i), legNodes(i + 1)) match {
        case Some((ms, legPath)) =>
          totalMs += ms
          path ++= legPath.drop(1) // first node repeats the previous leg's last
        case None => return None // disconnected leg: whole trace fails to match
      }
      i += 1
    }
    val nodes = path.toArray
    val edges = (0 until nodes.length - 1).map { k =>
      val (ms, distM) = edgeAttrs(g, nodes(k), nodes(k + 1))
      val hours = ms / 3600000.0
      TraceEdge(distM / 1000.0, if (hours > 0) (distM / 1000.0) / hours else 0.0,
        ms / 1000.0, k, k + 1)
    }
    Some(TraceMatch(nodes, totalMs, d.pathDistanceM(nodes), points.map(_._2), edges))
  }

  /** (weightMs, distM) of the minimum-weight forward edge u→v. */
  private def edgeAttrs(g: PreparedGraph, u: Int, v: Int): (Int, Double) = {
    var k = g.offsets(u); var bestMs = Int.MaxValue; var bestD = 0.0
    while (k < g.offsets(u + 1)) {
      if (g.targets(k) == v && g.weightsMs(k) < bestMs) {
        bestMs = g.weightsMs(k); bestD = g.distM(k)
      }
      k += 1
    }
    if (bestMs == Int.MaxValue) (0, Geo.haversineM(g.nodeLat(u), g.nodeLon(u), g.nodeLat(v), g.nodeLon(v)))
    else (bestMs, bestD)
  }

  /** Polygon contour per cutoff as a GeoJSON FeatureCollection — the
    * Valhalla-contour surface (valhalla-wrapper/src/wrapper.cpp:323-383).
    * Construction matches Valhalla's isotile: the settled Dijkstra cost
    * field rasterized onto a regular grid and contoured at the budget
    * ([[graft.geo.Isotile]]) — exact cell membership (budget-satisfying
    * nodes inside, unreached samples outside, notches and pockets
    * preserved), where the former k-NN concave hull was a cloud
    * heuristic. One polygon → "Polygon", several components →
    * "MultiPolygon", holes as inner rings. Cutoffs in minutes, like the
    * reference's `contours: [{time: ...}]` request shape.
    */
  def isochroneContours(g: PreparedGraph, lat: Double, lon: Double,
                        cutoffsMinutes: Seq[Double],
                        gridCells: Int = 128): String =
    contoursOver(g, lat, lon, cutoffsMinutes, "time", gridCells)

  /** Distance contours (`contours[].distance`, km — Valhalla's second
    * isochrone metric): same isotile rasterization over the MIN-DISTANCE
    * expansion, which is a different tree than min-time (it will take a
    * short slow road the time metric routes around).
    */
  def isodistanceContours(g: PreparedGraph, lat: Double, lon: Double,
                          cutoffsKm: Seq[Double],
                          gridCells: Int = 128): String =
    contoursOver(g, lat, lon, cutoffsKm, "distance", gridCells)

  private def contoursOver(g: PreparedGraph, lat: Double, lon: Double,
                           cutoffs: Seq[Double], metric: String,
                           gridCells: Int): String = {
    val s = g.snap(lat, lon)
    val features = if (s < 0) Nil else {
      // field costs in the metric's integer unit: ms for time, mm for
      // distance — Isotile interpolates on Longs either way
      val field: Seq[(Double, Double, Long)] =
        if (metric == "time") {
          val maxMs = (cutoffs.max * 60000).toLong
          calc(g).reachableWithin(s, maxMs).toSeq
            .map { case (n, ms) => (g.nodeLon(n), g.nodeLat(n), ms) }
        } else {
          val maxM = cutoffs.max * 1000.0
          calc(g).reachableWithinDistM(s, maxM).toSeq
            .map { case (n, m) => (g.nodeLon(n), g.nodeLat(n),
              math.round(m * 1000.0)) }
        }
      // resolution follows the expansion density (Valhalla sizes its
      // isotile from the expansion too): ~sqrt(settled) cells per side
      // keeps the average cell at ≥1 settled node, so a connected reach
      // rasterizes connected; finer than that and sparse node clouds
      // shatter into single-cell islands
      val res = math.min(gridCells,
        math.max(4, math.ceil(math.sqrt(field.size.toDouble)).toInt))
      cutoffs.sorted.map { cm =>
        val cut =
          if (metric == "time") (cm * 60000).toLong
          else math.round(cm * 1000.0 * 1000.0) // km → mm
        val polys = graft.geo.Isotile.contours(field, cut, res)
        def ringJson(r: Seq[(Double, Double)]): String =
          r.map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")
        def polyJson(p: Seq[Seq[(Double, Double)]]): String =
          p.map(ringJson).mkString("[", ",", "]")
        val geom =
          if (polys.lengthCompare(1) == 0)
            s"""{"type":"Polygon","coordinates":${polyJson(polys.head)}}"""
          else
            s"""{"type":"MultiPolygon","coordinates":${polys.map(polyJson).mkString("[", ",", "]")}}"""
        s"""{"type":"Feature","properties":{"contour":$cm,"metric":"$metric"},""" +
          s""""geometry":$geom}"""
      }
    }
    s"""{"type":"FeatureCollection","features":[${features.mkString(",")}]}"""
  }
}
