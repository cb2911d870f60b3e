package graft

import graft.geo.Hull
import graft.graph.GridFixture
import graft.queries.Routing
import org.scalatest.funsuite.AnyFunSuite

class ContourSpec extends AnyFunSuite {

  private lazy val spark = { val s = SparkTestBase.spark; Routing.ensure(s); s }

  test("convex hull: square with interior point, collinear degeneracy") {
    val square = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (1.0, 1.0))
    val ring = Hull.convex(square)
    assert(ring.head == ring.last)
    assert(ring.distinct.toSet == Set((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
    assert(Hull.convex(Seq((1.0, 1.0))) == Seq((1.0, 1.0)))
    // collinear points collapse to the segment endpoints
    val seg = Hull.convex(Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0)))
    assert(seg.distinct.toSet == Set((0.0, 0.0), (2.0, 0.0)))
  }

  test("concave hull excludes a notch the convex hull covers") {
    // U-shaped cloud: unit grid on [0,10]^2 minus the open notch x in (3,7),
    // y > 3. The notch interior is inside the convex hull by construction;
    // a concave (Valhalla-semantics) contour must exclude it.
    val cloud = for {
      x <- 0 to 10; y <- 0 to 10
      if !(x > 3 && x < 7 && y > 3)
    } yield (x.toDouble, y.toDouble)
    val notch = (5.0, 8.0)
    val cv = Hull.convex(cloud)
    assert(Hull.pointInRing(notch, cv), "sanity: notch is inside the convex hull")
    val cc = Hull.concave(cloud)
    assert(cc.head == cc.last, "concave ring is closed")
    assert(!Hull.pointInRing(notch, cc), "concave hull excludes the notch")
    // and it still covers the cloud itself
    assert(cloud.forall(p => cc.contains(p) || Hull.pointInRing(p, cc) ||
      cc.sliding(2).exists(s => s.head == p || s.last == p)))
  }

  test("thinned concave hull on a city-scale cloud still excludes the notch") {
    // 100x100 unit grid minus the notch — ~8.3k points, above the thinning
    // threshold, the realistic isochrone-cloud size
    val cloud = for {
      x <- 0 to 99; y <- 0 to 99
      if !(x > 30 && x < 70 && y > 30)
    } yield (x.toDouble, y.toDouble)
    assert(cloud.length > 4000)
    val t0 = System.nanoTime()
    val thinned = Hull.thin(cloud)
    val cc = Hull.concave(thinned)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(thinned.length <= 4000)
    assert(cc.head == cc.last)
    assert(!Hull.pointInRing((50.0, 80.0), cc), "notch interior must stay outside")
    assert(Hull.pointInRing((15.0, 50.0), cc), "left arm interior must stay inside")
    assert(Hull.pointInRing((50.0, 10.0), cc), "base interior must stay inside")
    info(f"thin ${cloud.length} -> ${thinned.length} pts, hull ${cc.length} vtx in $ms%.0f ms")
  }

  test("isotile contour contains exactly the budget-satisfying samples (notch case)") {
    // U-shaped reach on an 11x11 lattice: notch samples are PRESENT in the
    // settled field but over budget — the grid construction must leave
    // their cells outside, where a hull walk could smooth across the
    // opening. Cell-per-node resolution (nCells = 10 spans per side).
    val cut = 1000L
    val field = for {
      x <- 0 to 10; y <- 0 to 10
    } yield {
      val overBudget = x > 3 && x < 7 && y > 3
      (x.toDouble, y.toDouble, if (overBudget) 9999L else 500L)
    }
    val polys = graft.geo.Isotile.contours(field, cut, nCells = 10)
    assert(polys.nonEmpty)
    def insideAny(p: (Double, Double)): Boolean = polys.exists { poly =>
      Hull.pointInRing(p, poly.head) && !poly.tail.exists(h => Hull.pointInRing(p, h))
    }
    field.foreach { case (x, y, c) =>
      if (c <= cut) assert(insideAny((x, y)), s"reached ($x,$y) must be inside")
      else assert(!insideAny((x, y)), s"over-budget ($x,$y) must be outside")
    }
    // the notch interior (between lattice points) is outside too
    assert(!insideAny((5.0, 8.0)))
  }

  test("isotile emits a hole for an interior unreached pocket") {
    // reachable ring around an unreached center: one outer ring + one hole
    val field = for {
      x <- 0 to 6; y <- 0 to 6
    } yield (x.toDouble, y.toDouble,
      if (x >= 2 && x <= 4 && y >= 2 && y <= 4) 9999L else 100L)
    val polys = graft.geo.Isotile.contours(field, 1000L, nCells = 6)
    assert(polys.length == 1, s"one connected component, got ${polys.length}")
    assert(polys.head.length == 2, s"outer + hole, got ${polys.head.length} rings")
    val outer = polys.head.head; val hole = polys.head(1)
    assert(Hull.pointInRing((3.0, 3.0), outer) && Hull.pointInRing((3.0, 3.0), hole),
      "pocket center sits inside the hole ring (excluded from the polygon)")
    assert(Hull.pointInRing((0.5, 0.5), outer) && !Hull.pointInRing((0.5, 0.5), hole),
      "ring interior is polygon interior")
  }

  test("isotile attaches a nested hole to the innermost outer ring (island-in-lake)") {
    // region with an unreached lake, a reached island in the lake, and an
    // unreached pond at the island's center: the pond's test point lies
    // inside BOTH outer rings (each ring's even-odd test ignores the
    // other), so attachment must pick the smallest containing outer — the
    // island — not whichever ring discovery order offers first
    val field = for {
      x <- 0 to 12; y <- 0 to 12
    } yield {
      val inLake = x >= 2 && x <= 10 && y >= 2 && y <= 10
      val inIsland = x >= 4 && x <= 8 && y >= 4 && y <= 8
      val inPond = x == 6 && y == 6
      val reached = !inLake || (inIsland && !inPond)
      (x.toDouble, y.toDouble, if (reached) 100L else 9999L)
    }
    val polys = graft.geo.Isotile.contours(field, 1000L, nCells = 12)
    assert(polys.length == 2, s"region + island, got ${polys.length}")
    def outerMaxX(p: Seq[Seq[(Double, Double)]]): Double = p.head.map(_._1).max
    val island = polys.minBy(outerMaxX)
    val region = polys.maxBy(outerMaxX)
    assert(region.length == 2, s"region has exactly the lake hole, got ${region.length - 1}")
    assert(island.length == 2, s"island has exactly the pond hole, got ${island.length - 1}")
    assert(Hull.pointInRing((6.0, 6.0), island(1)), "pond is the island's hole")
    assert(Hull.pointInRing((3.0, 3.0), region(1)), "lake is the region's hole")
    assert(!Hull.pointInRing((6.0, 6.0), region(1)) ||
      Hull.pointInRing((6.0, 6.0), island.head),
      "pond must not be misattached to the region")
  }

  test("isotile keeps diagonally-touching components as separate polygons") {
    val field = Seq((0.0, 0.0, 100L), (1.0, 1.0, 100L), (3.0, 3.0, 9999L))
    val polys = graft.geo.Isotile.contours(field, 1000L, nCells = 3)
    assert(polys.length == 2, s"diagonal touch must not merge: ${polys.length}")
    polys.foreach(p => assert(p.head.length == 5, "each is a single cell square"))
  }

  test("isotile at full budget equals the reach, empty past it") {
    val field = Seq((0.0, 0.0, 100L), (1.0, 0.0, 200L))
    assert(graft.geo.Isotile.contours(field, 50L).isEmpty)
    val all = graft.geo.Isotile.contours(field, 300L, nCells = 1)
    assert(all.length == 1)
  }

  test("isochrone contours: nested polygons, smaller cutoff inside larger") {
    val gj = spark.sql(
      s"""SELECT travel_time_isochrone_geojson(${GridFixture.latOf(55)},
         |  ${GridFixture.lonOf(55)}, array(3.0D, 15.0D), 'auto') AS gj""".stripMargin)
      .collect().head.getString(0)
    assert(gj.contains("\"FeatureCollection\""))
    assert(gj.contains("\"contour\":3.0") && gj.contains("\"contour\":15.0"))
    // the isotile contour is faithful to connectivity: a fast corridor
    // reaching a detached pocket yields MultiPolygon, a connected reach a
    // single Polygon — both are valid Valhalla-shaped geometries
    assert(gj.contains("\"Polygon\"") || gj.contains("\"MultiPolygon\""))
    // crude nesting check: the 15-min polygon's lon span exceeds the 3-min one
    def span(contour: String): Double = {
      val part = gj.substring(gj.indexOf(contour))
      val xs = """\[(7\.\d+),""".r.findAllMatchIn(part.substring(0, part.length.min(4000)))
        .map(_.group(1).toDouble).toSeq
      xs.max - xs.min
    }
    assert(span("\"contour\":15.0") >= span("\"contour\":3.0"))
  }

  test("optimized_route visits all stops starting at location 0 and beats naive order") {
    val locs = Seq(0, 99, 9, 90, 55).map(i =>
      s"""{"lat": ${GridFixture.latOf(i)}, "lon": ${GridFixture.lonOf(i)}}""")
      .mkString("[", ", ", "]")
    val r = spark.sql(s"""SELECT travel_time_request('optimized_route',
      |  '{"locations": $locs, "costing": "auto"}') AS r""".stripMargin)
      .collect().head.getString(0)
    assert(r.contains("\"trip\""))
    val order = """"original_index":(\d+)""".r.findAllMatchIn(r).map(_.group(1).toInt).toSeq
    assert(order.length == 5 && order.head == 0 && order.toSet == Set(0, 1, 2, 3, 4))
    val total = """"time":([0-9.]+)""".r.findFirstMatchIn(r).get.group(1).toDouble
    // naive visit order 0->99->9->90->55 crosses the lattice 4 times; the
    // optimizer must do strictly better
    val naive = Seq(0 -> 99, 99 -> 9, 9 -> 90, 90 -> 55).map { case (a, b) =>
      spark.sql(s"""SELECT travel_time(${GridFixture.latOf(a)}, ${GridFixture.lonOf(a)},
        |${GridFixture.latOf(b)}, ${GridFixture.lonOf(b)}, 'auto') AS t""".stripMargin)
        .collect().head.getDouble(0)
    }.sum
    assert(total < naive)
  }
}
