package graft.routing

import graft.geo.Polyline
import org.json4s._
import org.json4s.jackson.JsonMethods

/** `travel_time_request(action, json)` — raw JSON pass-through API.
  *
  * Action set and response shapes follow the reference's dispatch
  * (src/travel_time_extension.cpp:729-757; action list
  * valhalla-wrapper/src/wrapper.cpp:422-461) and the response fields its
  * wrapper actually consumes: `trip.summary.length` (km), `trip.summary.time`
  * (s), `trip.legs[].shape` (encoded polyline, precision 6)
  * (valhalla-wrapper/src/wrapper.cpp:182-223). All nine reference actions
  * dispatch (wrapper.cpp:431-449): route, matrix/sources_to_targets, locate,
  * isochrone, optimized_route, trace_route, trace_attributes, height, status.
  * Unknown actions return an `{"error": ...}` JSON rather than throwing,
  * matching the error-channel contract (wrapper.cpp:31,40-43).
  */
object RequestApi {
  private implicit val formats: Formats = DefaultFormats

  /** Service limits from the reference's GENERATED Valhalla config
    * (src/valhalla_build_tiles_simple.cpp:104-129), enforced at the
    * `travel_time_request` surface — the same layer Valhalla's loki worker
    * enforces them (oversized requests answer on the error channel, they
    * never start a search). Costings absent from the generated config
    * (truck &c.) take the auto row, Valhalla's default-fill behavior.
    */
  object ServiceLimits {
    final val MatrixMaxPairs = 2500
    final val IsochroneMaxContours = 4
    final val IsochroneMaxTimeContourMin = 120.0
    /** `max_distance_contour` (km, valhalla_build_tiles_simple.cpp:113). */
    final val IsochroneMaxDistContourKm = 200.0
    final val IsochroneMaxLocations = 1
    final val TraceMaxShape = 16000
    def maxLocations(costing: String): Int = costing match {
      case "bicycle" | "pedestrian" => 50
      case _ => 20
    }
    def maxDistanceM(costing: String): Double = costing match {
      case "bicycle" => 500000.0
      case "pedestrian" => 250000.0
      case _ => 5000000.0
    }
    /** `max_matrix_distance` rows of the generated config
      * (valhalla_build_tiles_simple.cpp:106-111).
      */
    def maxMatrixDistanceM(costing: String): Double = costing match {
      case "bicycle" | "pedestrian" => 200000.0
      case _ => 400000.0
    }
    /** `max_exclude_locations` (valhalla_build_tiles_simple.cpp:123). */
    final val MaxExcludeLocations = 50
    /** skadi `max_shape` — the height action's point cap
      * (valhalla_build_tiles_simple.cpp:119).
      */
    final val HeightMaxShape = 750000
  }

  def dispatch(h: RouterHandle, action: String, json: String): String = {
    try {
      val req = JsonMethods.parse(json)
      val costing = (req \ "costing").extractOpt[String].getOrElse("auto")
      action match {
        case "status" =>
          compact(JObject(
            "version" -> JString("graft-0.1"),
            "has_tiles" -> JBool(h.graphs.nonEmpty),
            "modes" -> JArray(h.graphs.keys.toList.sorted.map(JString(_)))))
        case "route" => route(h, costing, req)
        case "locate" => locate(h, costing, req)
        case "matrix" | "sources_to_targets" => matrix(h, costing, req)
        case "isochrone" => isochrone(h, costing, req)
        case "optimized_route" => optimizedRoute(h, costing, req)
        case "trace_route" => traceRoute(h, costing, req)
        case "trace_attributes" => traceAttributes(h, costing, req)
        case "height" => height(req)
        case other =>
          err(s"Action '$other' not supported (supported: route, matrix, " +
            "sources_to_targets, locate, isochrone, optimized_route, " +
            "trace_route, trace_attributes, height, status)")
      }
    } catch {
      case e: Exception => err(e.getMessage)
    }
  }

  private def err(msg: String): String =
    compact(JObject("error" -> JString(if (msg == null) "request failed" else msg)))

  private def compact(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  /** Distance units per `directions_options.units` (or top-level `units`,
    * the newer Valhalla spelling; README.md:242): kilometers unless
    * miles/mi is requested. Valhalla's own conversion constant (1.609344
    * km per international mile) keeps lengths bit-comparable.
    */
  private def unitsOf(req: JValue): (String, Double) = {
    val u = (req \ "directions_options" \ "units").extractOpt[String]
      .orElse((req \ "units").extractOpt[String])
      .getOrElse("kilometers")
    if (u == "miles" || u == "mi") ("miles", 1.0 / 1.609344)
    else ("kilometers", 1.0)
  }

  private def locations(req: JValue, field: String = "locations"): List[(Double, Double)] =
    (req \ field) match {
      case JArray(ls) => ls.map { l =>
        ((l \ "lat").extract[Double], (l \ "lon").extract[Double])
      }
      case _ => Nil
    }

  private def route(h: RouterHandle, costing: String, req: JValue): String = {
    val locs = locations(req)
    if (locs.length < 2) return err("route requires >= 2 locations")
    if (locs.length > ServiceLimits.maxLocations(costing))
      return err(s"Exceeded max locations of ${ServiceLimits.maxLocations(costing)}")
    // loki's PRE-search rejection: the straight-line (haversine) distance
    // between consecutive locations is checked against the limit before any
    // graph work, so an oversized request never pays the search the limit
    // exists to prevent (and a borderline beeline-under/path-over request
    // routes, as in the reference)
    val beelineM = locs.sliding(2).map { pair =>
      graft.geo.Geo.haversineM(pair.head._1, pair.head._2, pair(1)._1, pair(1)._2)
    }.sum
    if (beelineM > ServiceLimits.maxDistanceM(costing))
      return err("Path distance exceeds the max distance limit")
    val g = h.requireGraph(costing)
    // Valhalla's exclude_locations: road points the route must not pass
    // through (each snaps to its nearest node; endpoints exempt)
    val excl = locations(req, "exclude_locations")
    if (excl.length > ServiceLimits.MaxExcludeLocations)
      return err(s"Exceeded max avoid locations of ${ServiceLimits.MaxExcludeLocations}")
    // multi-stop: one leg per consecutive location pair — the reference's
    // response decoder loops over trip.legs[] (wrapper.cpp:204-221), so the
    // leg-per-waypoint shape is part of the surface, not an extension
    val legs = locs.sliding(2).map { pair =>
      RoutingOps.routeAvoiding(g, (pair.head._2, pair.head._1),
        (pair(1)._2, pair(1)._1), excl)
    }.toList
    if (legs.exists(_.isEmpty)) return err("No route found")
    val rs = legs.flatten
    val (unit, f) = unitsOf(req)
    val legJson = rs.map { r =>
      val pts = graft.geo.Wkb.readLineString(r.geometry).getOrElse(Array.empty)
        .map { case (lon, lat) => (lat, lon) }.toSeq
      JObject(
        "summary" -> JObject(
          "length" -> JDouble(r.distance_km * f),
          "time" -> JDouble(r.duration_minutes * 60.0)),
        "shape" -> JString(Polyline.encode(pts, precision = 6)))
    }
    compact(JObject("trip" -> JObject(
      "status" -> JInt(0),
      "units" -> JString(unit),
      "summary" -> JObject(
        "length" -> JDouble(rs.map(_.distance_km).sum * f),
        "time" -> JDouble(rs.map(_.duration_minutes).sum * 60.0)),
      "legs" -> JArray(legJson))))
  }

  private def locate(h: RouterHandle, costing: String, req: JValue): String = {
    val g = h.requireGraph(costing)
    val out = locations(req).map { case (lat, lon) =>
      RoutingOps.snap(g, lat, lon) match {
        case Some(s) => JObject(
          "lat" -> JDouble(s.lat), "lon" -> JDouble(s.lon),
          "distance_m" -> JDouble(s.distance_m))
        case None => JObject("error" -> JString("no snap"))
      }
    }
    compact(JArray(out))
  }

  private def matrix(h: RouterHandle, costing: String, req: JValue): String = {
    val srcs = locations(req, "sources")
    val dsts = locations(req, "targets")
    if (srcs.isEmpty || dsts.isEmpty) return err("matrix requires sources and targets")
    if (srcs.length.toLong * dsts.length > ServiceLimits.MatrixMaxPairs)
      return err("Sources to targets exceeded the max location pairs of " +
        s"${ServiceLimits.MatrixMaxPairs}")
    // loki's pre-search max_matrix_distance: the straight-line distance of
    // every source→target pair is bounded before any graph work
    val maxBeeline = (for (s <- srcs; t <- dsts) yield
      graft.geo.Geo.haversineM(s._1, s._2, t._1, t._2)).maxOption.getOrElse(0.0)
    if (maxBeeline > ServiceLimits.maxMatrixDistanceM(costing))
      return err("Path distance exceeds the max distance limit")
    val g = h.requireGraph(costing)
    val entries = RoutingOps.matrixEntries(g,
      srcs.map(_._1), srcs.map(_._2), dsts.map(_._1), dsts.map(_._2))
    val (unit, f) = unitsOf(req)
    // valhalla shape: sources_to_targets[srcIdx][dstIdx] = {time, distance}
    val rows = entries.groupBy(_.from_idx).toList.sortBy(_._1).map { case (_, row) =>
      JArray(row.sortBy(_.to_idx).toList.map { e =>
        JObject(
          "time" -> (if (e.duration_s < 0) JNull else JDouble(e.duration_s)),
          "distance" -> (if (e.distance_m < 0) JNull
            else JDouble(e.distance_m / 1000.0 * f)),
          "from_index" -> JInt(e.from_idx), "to_index" -> JInt(e.to_idx))
      })
    }
    compact(JObject("sources_to_targets" -> JArray(rows), "units" -> JString(unit)))
  }

  /** Visit-all-locations tour from the first location: greedy nearest
    * neighbor + 2-opt over the pairwise matrix (the reference delegates this
    * to Valhalla's optimizer, wrapper.cpp:422-461 `optimized_route`).
    * Response carries the visit order and total time.
    */
  private def optimizedRoute(h: RouterHandle, costing: String, req: JValue): String = {
    val locs = locations(req)
    if (locs.length < 2) return err("optimized_route requires >= 2 locations")
    val g = h.requireGraph(costing)
    val m = locs.length
    val entries = RoutingOps.matrixEntries(g,
      locs.map(_._1), locs.map(_._2), locs.map(_._1), locs.map(_._2))
    val cost = Array.ofDim[Double](m, m)
    entries.foreach(e => cost(e.from_idx)(e.to_idx) =
      if (e.duration_s < 0) Double.MaxValue / 4 else e.duration_s)
    // greedy tour from location 0
    var tour = {
      val seen = Array.fill(m)(false); seen(0) = true
      val t = scala.collection.mutable.ArrayBuffer(0)
      while (t.length < m) {
        val last = t.last
        val next = (0 until m).filter(!seen(_)).minBy(cost(last))
        seen(next) = true; t += next
      }
      t.toArray
    }
    // 2-opt until no improving swap
    def tourCost(t: Array[Int]): Double =
      t.sliding(2).map { case Array(a, b) => cost(a)(b) }.sum
    var improved = true
    while (improved) {
      improved = false
      var i = 1
      while (i < m - 1) {
        var j = i + 1
        while (j < m) {
          val cand = tour.take(i) ++ tour.slice(i, j + 1).reverse ++ tour.drop(j + 1)
          if (tourCost(cand) < tourCost(tour) - 1e-9) { tour = cand; improved = true }
          j += 1
        }
        i += 1
      }
    }
    compact(JObject("trip" -> JObject(
      "status" -> JInt(0),
      "summary" -> JObject("time" -> JDouble(math.floor(tourCost(tour) * 1000) / 1000)),
      "locations" -> JArray(tour.toList.map { i =>
        JObject("original_index" -> JInt(i),
          "lat" -> JDouble(locs(i)._1), "lon" -> JDouble(locs(i)._2))
      }))))
  }

  /** Trace input: `shape: [{lat, lon}, ...]` or `encoded_polyline`
    * (precision 6) — the two shapes Valhalla's trace/height actions accept.
    */
  private def shapePoints(req: JValue): List[(Double, Double)] =
    (req \ "encoded_polyline") match {
      case JString(enc) => Polyline.decode(enc, precision = 6).toList
      case _ => locations(req, "shape")
    }

  /** Map-match a trace and answer like `route` (the reference pipes
    * trace_route through the same trip-summary consumer,
    * valhalla-wrapper/src/wrapper.cpp:182-223,439-441).
    */
  private def traceRoute(h: RouterHandle, costing: String, req: JValue): String = {
    val pts = shapePoints(req)
    if (pts.length < 2) return err("trace_route requires >= 2 shape points")
    if (pts.length > ServiceLimits.TraceMaxShape)
      return err(s"Exceeded max shape of ${ServiceLimits.TraceMaxShape} points")
    val g = h.requireGraph(costing)
    val (unit, f) = unitsOf(req)
    RoutingOps.traceMatch(g, pts) match {
      case None => err("No path found along trace")
      case Some(m) =>
        val shape = m.pathNodes.toSeq.map(i => (g.nodeLat(i), g.nodeLon(i)))
        compact(JObject("trip" -> JObject(
          "status" -> JInt(0),
          "units" -> JString(unit),
          "summary" -> JObject(
            "length" -> JDouble(m.totalDistM / 1000.0 * f),
            "time" -> JDouble(m.totalMs / 1000.0)),
          "legs" -> JArray(List(JObject(
            "shape" -> JString(Polyline.encode(shape, precision = 6))))))))
    }
  }

  /** Matched-path attributes: per-edge length/speed/shape-span plus one
    * matched_points entry per input point (Valhalla trace_attributes
    * response surface; wrapper.cpp:442-443).
    */
  private def traceAttributes(h: RouterHandle, costing: String, req: JValue): String = {
    val pts = shapePoints(req)
    if (pts.isEmpty) return err("trace_attributes requires shape points")
    if (pts.length > ServiceLimits.TraceMaxShape)
      return err(s"Exceeded max shape of ${ServiceLimits.TraceMaxShape} points")
    val g = h.requireGraph(costing)
    RoutingOps.traceMatch(g, pts) match {
      case None => err("No path found along trace")
      case Some(m) =>
        val shape = m.pathNodes.toSeq.map(i => (g.nodeLat(i), g.nodeLon(i)))
        compact(JObject(
          "units" -> JString("kilometers"),
          "shape" -> JString(Polyline.encode(shape, precision = 6)),
          "edges" -> JArray(m.edges.toList.map { e =>
            JObject(
              "length" -> JDouble(e.length_km),
              "speed" -> JDouble(math.round(e.speed_kph * 1000) / 1000.0),
              "weight" -> JDouble(e.weight_s),
              "begin_shape_index" -> JInt(e.begin_shape_index),
              "end_shape_index" -> JInt(e.end_shape_index))
          }),
          "matched_points" -> JArray(m.points.toList.map { p =>
            JObject(
              "lat" -> JDouble(p.lat), "lon" -> JDouble(p.lon),
              "type" -> JString(if (p.ok) "matched" else "unmatched"),
              "distance_from_trace_point" ->
                (if (p.ok) JDouble(math.round(p.distance_m * 1000) / 1000.0) else JNull))
          })))
    }
  }

  /** Elevation per shape point (wrapper.cpp:445-446). Heights come from the
    * pluggable [[RoutingContext.setElevation]] sampler; without one every
    * height is null — Valhalla's behavior without elevation tiles. With
    * `range: true`, emits `range_height` pairs of
    * [cumulative distance m, height] like Valhalla's range form.
    */
  private def height(req: JValue): String = {
    val pts = shapePoints(req)
    if (pts.isEmpty) return err("height requires shape points")
    if (pts.length > ServiceLimits.HeightMaxShape)
      return err(s"Exceeded max shape of ${ServiceLimits.HeightMaxShape} points")
    val sampler = RoutingContext.elevation
    // NaN = "no data at this point" (raster sampler over a missing/void
    // tile) — rendered as JSON null per point, like Valhalla over a
    // partial elevation tileset; a whole-provider absence nulls all
    def hOf(lat: Double, lon: Double): JValue =
      sampler.map { f =>
        val v = f(lat, lon)
        if (v.isNaN) JNull else JDouble(math.round(v * 100) / 100.0): JValue
      }.getOrElse(JNull)
    val shapeJson = JArray(pts.map { case (lat, lon) =>
      JObject("lat" -> JDouble(lat), "lon" -> JDouble(lon))
    })
    if ((req \ "range").extractOpt[Boolean].getOrElse(false)) {
      var cum = 0.0
      val pairs = pts.zipWithIndex.map { case ((lat, lon), i) =>
        if (i > 0) {
          val (pLat, pLon) = pts(i - 1)
          cum += graft.geo.Geo.haversineM(pLat, pLon, lat, lon)
        }
        JArray(List(JDouble(math.round(cum * 10) / 10.0), hOf(lat, lon)))
      }
      compact(JObject("shape" -> shapeJson, "range_height" -> JArray(pairs)))
    } else
      compact(JObject("shape" -> shapeJson,
        "height" -> JArray(pts.map { case (lat, lon) => hOf(lat, lon) })))
  }

  private def isochrone(h: RouterHandle, costing: String, req: JValue): String = {
    val locs = locations(req)
    if (locs.isEmpty) return err("isochrone requires a location")
    if (locs.length > ServiceLimits.IsochroneMaxLocations)
      return err(s"Exceeded max locations of ${ServiceLimits.IsochroneMaxLocations}")
    // contours carry either `time` (minutes) or `distance` (km) — the two
    // Valhalla metrics; a request may not mix them (Valhalla's own rule)
    val entries = (req \ "contours") match {
      case JArray(cs) if cs.nonEmpty =>
        cs.map(c => ((c \ "time").extractOpt[Double],
          (c \ "distance").extractOpt[Double]))
      case _ => List((Some(10.0), None))
    }
    val timeCuts = entries.flatMap(_._1)
    val distCuts = entries.flatMap(_._2)
    if (timeCuts.nonEmpty && distCuts.nonEmpty)
      return err("Can't mix time and distance contours")
    val byDistance = distCuts.nonEmpty
    val cutoffs = if (byDistance) distCuts else timeCuts
    if (cutoffs.length > ServiceLimits.IsochroneMaxContours)
      return err(s"Exceeded max contours of ${ServiceLimits.IsochroneMaxContours}")
    if (!byDistance && cutoffs.exists(_ > ServiceLimits.IsochroneMaxTimeContourMin))
      return err("Exceeded max time contour of " +
        s"${ServiceLimits.IsochroneMaxTimeContourMin.toInt} minutes")
    if (byDistance && cutoffs.exists(_ > ServiceLimits.IsochroneMaxDistContourKm))
      return err("Exceeded max distance contour of " +
        s"${ServiceLimits.IsochroneMaxDistContourKm.toInt} km")
    val g = h.requireGraph(costing)
    // polygons:true -> Valhalla-style contour polygons (wrapper.cpp:323-383)
    if ((req \ "polygons").extractOpt[Boolean].getOrElse(false))
      return if (byDistance)
        RoutingOps.isodistanceContours(g, locs.head._1, locs.head._2, cutoffs)
      else RoutingOps.isochroneContours(g, locs.head._1, locs.head._2, cutoffs)
    if (byDistance) {
      // point-cloud form of the distance metric: (lon, lat, meters)
      val s = h.requireGraph(costing).snap(locs.head._1, locs.head._2)
      val maxM = cutoffs.max * 1000.0
      val pts =
        if (s < 0) Array.empty[(Int, Double)]
        else graft.routing.Routers.calculator(g).reachableWithinDistM(s, maxM)
      val features = pts.toList.map { case (n, m) =>
        JObject(
          "type" -> JString("Feature"),
          "geometry" -> JObject(
            "type" -> JString("Point"),
            "coordinates" -> JArray(List(JDouble(g.nodeLon(n)), JDouble(g.nodeLat(n))))),
          "properties" -> JObject("meters" -> JDouble(math.round(m * 10) / 10.0)))
      }
      return compact(JObject("type" -> JString("FeatureCollection"),
        "features" -> JArray(features)))
    }
    val maxSec = cutoffs.maxOption.getOrElse(10.0) * 60.0
    val nodes = RoutingOps.isochrone(g, locs.head._1, locs.head._2, maxSec)
    val features = nodes.toList.map { n =>
      JObject(
        "type" -> JString("Feature"),
        "geometry" -> JObject(
          "type" -> JString("Point"),
          "coordinates" -> JArray(List(JDouble(n.lon), JDouble(n.lat)))),
        "properties" -> JObject("seconds" -> JDouble(n.seconds)))
    }
    compact(JObject("type" -> JString("FeatureCollection"), "features" -> JArray(features)))
  }
}
