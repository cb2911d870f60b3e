package graft

import graft.geo.Geo
import graft.graph.{GraphBuilder, GridFixture, GridIndex, SpeedModel}
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's Rust unit tests (rust/src/lib.rs:1014-1057):
  * speed-model lookup, main-road classification, nearest-neighbor snap,
  * plus CSR assembly invariants.
  */
class GraphSpec extends AnyFunSuite {

  test("speed model mirrors reference table (rust/src/lib.rs:43-98)") {
    assert(SpeedModel.speedKmh("motorway", "auto").contains(120.0))
    assert(SpeedModel.speedKmh("residential", "auto").contains(30.0))
    assert(SpeedModel.speedKmh("service", "auto").contains(20.0))
    assert(SpeedModel.speedKmh("footway", "auto") == None)
    assert(SpeedModel.speedKmh("cycleway", "bicycle").contains(20.0))
    assert(SpeedModel.speedKmh("footway", "pedestrian").contains(5.0))
    assert(SpeedModel.speedKmh("residential", "nosuchmode") == None)
  }

  test("valhalla costing profiles: truck/bus heavy, taxi/motorcycle=auto, scooter capped") {
    // heavy profile: strictly at-or-below auto on every class it allows,
    // barred from living_street — so a truck route can never beat the car
    // route over the same feasible set (ITALY.md:238-245 golden ordering)
    for (h <- SpeedModel.MainRoads) {
      val autoS = SpeedModel.speedKmh(h, "auto")
      val truckS = SpeedModel.speedKmh(h, "truck")
      if (h == "living_street") assert(truckS.isEmpty)
      else assert(truckS.get < autoS.get, h)
      assert(SpeedModel.speedKmh(h, "bus") == truckS) // bus shares the profile
      assert(SpeedModel.speedKmh(h, "taxi") == autoS)
      assert(SpeedModel.speedKmh(h, "motorcycle") == autoS)
      val scoot = SpeedModel.speedKmh(h, "motor_scooter")
      if (h.startsWith("motorway")) assert(scoot.isEmpty)
      else assert(scoot == autoS.map(math.min(_, 45.0)), h)
    }
    assert(SpeedModel.speedKmh("footway", "truck").isEmpty)
  }

  test("main-road classification (rust/src/lib.rs:100-118)") {
    assert(SpeedModel.isMainRoad("motorway"))
    assert(SpeedModel.isMainRoad("residential"))
    assert(!SpeedModel.isMainRoad("footway"))
    assert(!SpeedModel.isMainRoad("cycleway"))
  }

  test("edge weight truncates like the reference (rust/src/lib.rs:199-205)") {
    // 1000 m at 30 km/h = 120000 ms exactly
    assert(SpeedModel.timeMs(1000.0, 30.0) == 120000L)
    assert(SpeedModel.timeMs(0.0, 30.0) == 0L)
  }

  test("grid index nearest matches brute force on random points") {
    val r = new scala.util.Random(7)
    val n = 500
    val lats = Array.fill(n)(43.0 + r.nextDouble())
    val lons = Array.fill(n)(7.0 + r.nextDouble())
    val idx = GridIndex.build(Array.tabulate(n)(identity), lats, lons)
    (0 until 200).foreach { _ =>
      val qLat = 43.0 + r.nextDouble(); val qLon = 7.0 + r.nextDouble()
      val got = idx.nearest(qLat, qLon)
      val want = (0 until n).minBy(i => Geo.approxDist2(qLat, qLon, lats(i), lons(i)))
      assert(Geo.approxDist2(qLat, qLon, lats(got), lons(got)) ==
        Geo.approxDist2(qLat, qLon, lats(want), lons(want)))
    }
  }

  test("grid index: empty input returns -1") {
    val idx = GridIndex.build(Array.empty, Array.empty, Array.empty)
    assert(idx.nearest(43.0, 7.0) == -1)
  }

  test("CSR assembly preserves adjacency, forward and reverse") {
    val lat = Array(0.0, 0.0, 0.0); val lon = Array(0.0, 1.0, 2.0)
    val edges = Array((0, 1, 100.0, 10L), (1, 2, 200.0, 20L), (0, 2, 300.0, 30L))
    val g = GraphBuilder.buildCsr(3, lat, lon, Array(true, true, true), edges)
    assert(g.numNodes == 3 && g.numEdges == 3)
    // out-edges of 0: {1 (10ms), 2 (30ms)}
    val out0 = (g.offsets(0) until g.offsets(1)).map(e => (g.targets(e), g.weightsMs(e))).toSet
    assert(out0 == Set((1, 10), (2, 30)))
    // in-edges of 2 via reverse CSR: {1, 0}
    val in2 = (g.rOffsets(2) until g.rOffsets(3)).map(g.rTargets(_)).toSet
    assert(in2 == Set(0, 1))
  }

  test("grid fixture: 100 nodes, snap hits exact lattice point (<500 m bound)") {
    val g = GridFixture.prepared("auto")
    assert(g.numNodes == 100) // z_integration.test.skip:20-22 analogue
    val (idx, dist) = g.snapWithDistance(GridFixture.latOf(37) + 0.001,
      GridFixture.lonOf(37) + 0.001).get
    assert(idx == 37)
    assert(dist < 500.0) // z_integration.test.skip:37-40
  }

  test("Italy-scale columnar prepare: 10M-edge synthetic assembles without OOM") {
    // 1600x1600 lattice ≈ 2.56M nodes / 10.2M directed edges — the
    // Italy-class scale (ITALY.md:55-56) the round-1 Row collect could not
    // hold in driver objects. Pure SQL expressions, no UDF.
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val k = 1600
    val n = k.toLong * k
    val nodes = spark.range(n).select(
      $"id",
      (lit(43.0) + ($"id" / k).cast("long") * 0.009).as("lat"),
      (lit(7.0) + ($"id" % k) * 0.009).as("lon"),
      lit(true).as("main_road"))
    val horiz = spark.range(n).filter($"id" % k < k - 1)
      .select($"id".as("src"), ($"id" + 1).as("dst"))
    val vert = spark.range(n - k)
      .select($"id".as("src"), ($"id" + k).as("dst"))
    val fwd = horiz.unionByName(vert)
    val rev = fwd.select($"dst".as("src"), $"src".as("dst"))
    val edges = fwd.unionByName(rev)
      .select($"src", $"dst", lit(900.0).as("dist_m"), lit(108000L).as("time_ms"))
    val t0 = System.nanoTime()
    val g = GraphBuilder.prepare(nodes, edges)
    val s = (System.nanoTime() - t0) / 1e9
    info(f"prepare(2.56M nodes, ${g.numEdges / 1e6}%.1fM edges) in $s%.1f s")
    assert(g.numNodes == n)
    assert(g.numEdges == 2 * (2L * k * (k - 1)))
    // spot adjacency: corner node 0 has out-edges to 1 and k
    val out0 = (g.offsets(0) until g.offsets(1)).map(g.targets(_)).toSet
    assert(out0 == Set(1, k))
  }
}
