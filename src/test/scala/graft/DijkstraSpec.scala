package graft

import graft.algo.Dijkstra
import graft.geo.Geo
import graft.graph.{GraphBuilder, GridFixture, SpeedModel}
import graft.routing.RoutingOps
import org.scalatest.funsuite.AnyFunSuite

/** Routing-kernel goldens on the deterministic grid fixture (FIXTURES.md).
  * Mirrors the reference's behavioral assertions (test/sql/monaco_routing.test,
  * test/sql/z_integration.test.skip) but with exactly computable expectations.
  */
class DijkstraSpec extends AnyFunSuite {

  private val g = GridFixture.prepared("auto")
  private def d = new Dijkstra(g)

  private def edgeMs(a: Int, b: Int, hw: String = "residential"): Long = {
    val m = Geo.haversineM(GridFixture.latOf(a), GridFixture.lonOf(a),
      GridFixture.latOf(b), GridFixture.lonOf(b))
    SpeedModel.timeMs(m, SpeedModel.speedKmh(hw, "auto").get)
  }

  test("adjacent lattice hop equals dist/30kmh exactly") {
    assert(d.shortestPathMs(0, 1) == edgeMs(0, 1))
    assert(d.shortestPathMs(0, 10) == edgeMs(0, 10))
  }

  test("same node is zero; unknown snap index is -1") {
    assert(d.shortestPathMs(42, 42) == 0L)
    assert(d.shortestPathMs(-1, 5) == -1L)
  }

  test("diagonal motorway beats manhattan residential path") {
    // 0 -> 99: the diagonal motorway (120 km/h) should dominate
    val cost = d.shortestPathMs(0, 99)
    val manhattanMs = (0 until 9).map(j => edgeMs(j, j + 1)).sum +
      (0 until 9).map(i => edgeMs(i * 10 + 9, (i + 1) * 10 + 9)).sum
    assert(cost > 0 && cost < manhattanMs)
    // and the path actually uses diagonal nodes (0, 11, 22, ...)
    val Some((_, path)) = d.shortestPathWithNodes(0, 99)
    assert(path.head == 0 && path.last == 99)
    assert(path.toSet.intersect(Set(11, 22, 33, 44)).nonEmpty)
  }

  test("path reconstruction yields connected consecutive edges") {
    val Some((cost, path)) = d.shortestPathWithNodes(3, 97)
    assert(path.head == 3 && path.last == 97)
    path.sliding(2).foreach { case Array(u, v) =>
      val out = (g.offsets(u) until g.offsets(u + 1)).map(g.targets(_))
      assert(out.contains(v), s"edge $u->$v missing")
    }
    // cost equals sum of traversed edge weights
    val sum = path.sliding(2).map { case Array(u, v) =>
      (g.offsets(u) until g.offsets(u + 1))
        .collectFirst { case e if g.targets(e) == v => g.weightsMs(e).toLong }.get
    }.sum
    assert(sum == cost)
  }

  test("top-row oneway: eastbound direct, westbound detours") {
    val east = d.shortestPathMs(90, 99) // along oneway row
    val west = d.shortestPathMs(99, 90) // must leave the row
    assert(east > 0 && west > east)
  }

  test("one-to-many agrees with single-target queries") {
    val targets = Array(5, 37, 60, 99, 0)
    val rows = d.oneToMany(0, targets)
    targets.zipWithIndex.foreach { case (t, i) =>
      assert(rows(i)._1 == d.shortestPathMs(0, t), s"target $t")
    }
    // distance along path: recompute via reconstruction (CSR stores edge
    // meters as Float, so allow centimeter-scale accumulation error)
    val Some((_, path)) = d.shortestPathWithNodes(0, 37)
    assert(math.abs(rows(1)._2 - d.pathDistanceM(path)) < 0.01)
  }

  test("one-to-many with unreachable target returns (-1,-1)") {
    // isolated extra node: build a tiny graph with a disconnected vertex
    val lat = Array(43.0, 43.01, 50.0); val lon = Array(7.0, 7.01, 10.0)
    val tiny = GraphBuilder.buildCsr(3, lat, lon, Array(true, true, true),
      Array((0, 1, 1000.0, 60000L)))
    val dd = new Dijkstra(tiny)
    val rows = dd.oneToMany(0, Array(1, 2))
    assert(rows(0) == ((60000L, 1000.0)))
    assert(rows(1) == ((-1L, -1.0)))
    assert(dd.shortestPathMs(0, 2) == -1L)
  }

  test("distance reach: exact haversine hop meters, min-DISTANCE tree not rescaled time") {
    // adjacent hops: reported meters equal the haversine edge length
    def hopM(a: Int, b: Int): Double =
      Geo.haversineM(GridFixture.latOf(a), GridFixture.lonOf(a),
        GridFixture.latOf(b), GridFixture.lonOf(b))
    val r = d.reachableWithinDistM(0, 1100.0).toMap
    assert(math.abs(r(1) - hopM(0, 1)) < 0.01)   // east ~727 m
    assert(math.abs(r(10) - hopM(0, 10)) < 0.01) // north ~1001 m
    assert(r(0) == 0.0)
    // monotone in budget and bounded by it
    val r5 = d.reachableWithinDistM(0, 5000.0)
    assert(r5.length > r.size && r5.forall(_._2 <= 5000.0))
    assert(r.keySet.subsetOf(r5.map(_._1).toSet))
    // the metric is distance, NOT time: from (0,0), the diagonal motorway
    // to (1,1) is FASTER than the two-hop lattice walk but LONGER in
    // meters (hypotenuse ~1237 m vs going through the corner at min
    // distance only if shorter) — min-distance must pick the true
    // shortest-length path to (1,1)
    val diag = hopM(0, GridFixture.nodeId(1, 1))
    val viaCorner = hopM(0, 1) + hopM(1, GridFixture.nodeId(1, 1))
    assert(math.abs(r5.toMap.apply(GridFixture.nodeId(1, 1))
      - math.min(diag, viaCorner)) < 0.01)
  }

  test("isochrone: monotone in budget, full lattice within 30 min (z_integration analogue)") {
    // residential hop ≈ 87 s (E-W) / 120 s (N-S); motorway diagonal hop ≈ 37 s
    val small = d.reachableWithin(55, 60 * 1000L)
    val mid = d.reachableWithin(55, 300 * 1000L)
    val all = d.reachableWithin(55, 1800 * 1000L)
    assert(small.map(_._1).toSet.subsetOf(mid.map(_._1).toSet))
    assert(mid.map(_._1).toSet.subsetOf(all.map(_._1).toSet))
    assert(mid.length > 20, s"expected >20 nodes within 300s, got ${mid.length}")
    assert(all.length == 100) // entire lattice
    assert(small.forall(_._2 <= 60000L))
    // source itself always present at cost 0
    assert(small.exists { case (n, c) => n == 55 && c == 0L })
  }

  test("reusable calculator: repeated queries on one instance stay correct") {
    val dd = d
    val a = dd.shortestPathMs(0, 99)
    val b = dd.shortestPathMs(99, 0)
    val c = dd.shortestPathMs(0, 99)
    assert(a == c)
    assert(b > 0)
  }

  test("mode ordering: auto < truck < bicycle < pedestrian (monaco_routing.test:82-88; ITALY.md:238-245)") {
    val modes = Seq("auto", "truck", "bicycle", "pedestrian").map { m =>
      val gm = GridFixture.prepared(m)
      m -> new Dijkstra(gm).shortestPathMs(0, 99)
    }.toMap
    assert(modes("auto") < modes("truck")) // heavy profile never beats car
    assert(modes("truck") < modes("bicycle"))
    assert(modes("bicycle") < modes("pedestrian"))
  }

  test("extra costings route end-to-end: taxi/motorcycle = auto, bus = truck, scooter off motorways") {
    def ms(m: String) = new Dijkstra(GridFixture.prepared(m)).shortestPathMs(0, 99)
    assert(ms("taxi") == ms("auto"))
    assert(ms("motorcycle") == ms("auto"))
    assert(ms("bus") == ms("truck"))
    // scooter: no motorway diagonal, 45 km/h cap -> strictly slower than
    // auto but still connected (residential lattice carries it)
    assert(ms("motor_scooter") > ms("auto"))
    assert(ms("motor_scooter") < Long.MaxValue)
  }

  test("travel time 0->99 under 20 minutes sanity bound (monaco <300s analogue)") {
    val sec = RoutingOps.travelTimeSeconds(g,
      GridFixture.latOf(0), GridFixture.lonOf(0),
      GridFixture.latOf(99), GridFixture.lonOf(99)).get
    assert(sec > 0 && sec < 1200)
  }

  test("avoiding a blocked node: empty set equals plain, detour forced, wall unreachable") {
    val d = new Dijkstra(g)
    val s = GridFixture.nodeId(0, 0)
    val t = GridFixture.nodeId(0, 2)
    val mid = GridFixture.nodeId(0, 1)
    val (plainMs, plainPath) = d.shortestPathWithNodes(s, t).get
    assert(plainPath.contains(mid)) // the direct row IS the shortest path

    val none = new java.util.HashSet[Integer]()
    assert(d.shortestPathWithNodesAvoiding(s, t, none).get._1 == plainMs)

    val blocked = new java.util.HashSet[Integer]()
    blocked.add(mid)
    val (ms, path) = d.shortestPathWithNodesAvoiding(s, t, blocked).get
    assert(!path.contains(mid), "route entered the excluded node")
    assert(ms > plainMs, "detour must cost strictly more than the direct row")
    // every hop of the detour is a real graph edge summing to the cost
    var sum = 0L
    for (k <- 1 until path.length) {
      val u = path(k - 1); val v = path(k)
      var e = g.offsets(u); var w = -1L
      while (e < g.offsets(u + 1)) {
        if (g.targets(e) == v && (w < 0 || g.weightsMs(e) < w)) w = g.weightsMs(e)
        e += 1
      }
      assert(w >= 0, s"hop $u->$v is not a graph edge"); sum += w
    }
    assert(sum == ms)

    // blocking every neighbor of the target walls it off
    val wall = new java.util.HashSet[Integer]()
    wall.add(GridFixture.nodeId(0, 1)); wall.add(GridFixture.nodeId(0, 3))
    wall.add(GridFixture.nodeId(1, 2))
    assert(d.shortestPathWithNodesAvoiding(s, t, wall).isEmpty)
  }
}
