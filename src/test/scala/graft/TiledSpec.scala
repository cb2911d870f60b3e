package graft

import graft.algo.Dijkstra
import graft.graph.{GridFixture, PreparedGraph, Tiled}
import org.scalatest.funsuite.AnyFunSuite

/** Exactness proof for tile-partitioned routing (SURVEY §9.2): the stitched
  * forward-leg / overlay / backward-leg distance must equal plain Dijkstra
  * on the flat graph for EVERY pair — including oneway asymmetries, pairs
  * inside one tile (where leaving and re-entering the tile may still be
  * shorter), and unreachable pairs.
  */
class TiledSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def dfsOf(g: PreparedGraph) = {
    import spark.implicits._
    val nodes = (0 until g.numNodes)
      .map(i => (i.toLong, g.nodeLat(i), g.nodeLon(i)))
      .toDF("id", "lat", "lon")
    val edges = (0 until g.numNodes).flatMap { u =>
      (g.offsets(u) until g.offsets(u + 1))
        .map(e => (u.toLong, g.targets(e).toLong, g.weightsMs(e).toLong))
    }.toDF("src", "dst", "time_ms")
    (nodes, edges)
  }

  private def checkExact(g: PreparedGraph, cells: Int, pairs: Int, seed: Int,
                         chGate: Int = 100000): Unit = {
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled").toString
    val router = Tiled.build(spark, nodes, edges, cells, dir, chGate)
    assert(router.overlay.size > 0 && router.overlay.size < g.numNodes,
      s"overlay ${router.overlay.size} of ${g.numNodes} nodes")
    assert((chGate == 0) == (router.overlay.ch == null),
      s"overlay CH presence should follow the gate (gate=$chGate)")
    val base = new Dijkstra(g)
    val r = new scala.util.Random(seed)
    (0 until pairs).foreach { _ =>
      val s = r.nextInt(g.numNodes); val t = r.nextInt(g.numNodes)
      val want = base.shortestPathMs(s, t)
      val got = router.travelTimeMs(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t))
      assert(got == want, s"tiled mismatch $s->$t: got $got want $want")
    }
    info(s"n=${g.numNodes} cells=${cells}x$cells overlay=${router.overlay.size} nodes / " +
      s"${router.overlay.numEdges} edges")
  }

  test("grid fixture (oneway top row): tiled == flat Dijkstra on 200 pairs, 2x2 tiles") {
    checkExact(GridFixture.prepared("auto"), cells = 2, pairs = 200, seed = 11)
  }

  test("40x40 lattice: tiled == flat Dijkstra on 120 pairs, 4x4 tiles") {
    checkExact(GridFixture.lattice(40), cells = 4, pairs = 120, seed = 12)
  }

  test("3x3 tiles on the fixture exercise multi-hop overlay paths") {
    checkExact(GridFixture.prepared("auto"), cells = 3, pairs = 150, seed = 13)
  }

  test("Dijkstra-stitch fallback (chGate=0) stays exact") {
    checkExact(GridFixture.prepared("auto"), cells = 2, pairs = 120, seed = 14, chGate = 0)
  }

  test("coordinate-input matrix: distributed snap + stitch == point queries") {
    import spark.implicits._
    val g = GridFixture.prepared("auto")
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled-mc").toString
    val router = Tiled.build(spark, nodes, edges, cells = 3, dir)
    val r = new scala.util.Random(81)
    // jittered coordinates near random nodes (the realistic input shape)
    val jitLat = 0.00004; val jitLon = 0.00006
    val pairs = (0 until 60).map { i =>
      val s = r.nextInt(g.numNodes); val t = r.nextInt(g.numNodes)
      (i.toLong,
        g.nodeLat(s) + (r.nextDouble() - 0.5) * jitLat,
        g.nodeLon(s) + (r.nextDouble() - 0.5) * jitLon,
        g.nodeLat(t) + (r.nextDouble() - 0.5) * jitLat,
        g.nodeLon(t) + (r.nextDouble() - 0.5) * jitLon)
    }
    val out = Tiled.matrixByCoords(spark, dir, router.grid, router.overlay,
        pairs.toDF("pair_id", "src_lat", "src_lon", "dst_lat", "dst_lon"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(out.size == 60)
    pairs.foreach { case (pid, sla, slo, dla, dlo) =>
      val want = router.travelTimeMs(sla, slo, dla, dlo)
      assert(out(pid) == want, s"pair $pid: got ${out(pid)} want $want")
    }
  }

  test("route geometry: stitched path is a real edge walk summing to the exact time") {
    val g = GridFixture.prepared("auto")
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled-geo").toString
    val router = Tiled.build(spark, nodes, edges, cells = 3, dir)
    // coord -> node and (u,v) -> min edge weight lookup over the flat graph
    val nodeOf = (0 until g.numNodes).map(i => (g.nodeLat(i), g.nodeLon(i)) -> i).toMap
    val minW = scala.collection.mutable.Map[(Int, Int), Long]()
    (0 until g.numNodes).foreach { u =>
      (g.offsets(u) until g.offsets(u + 1)).foreach { e =>
        val k = (u, g.targets(e))
        val w = g.weightsMs(e).toLong
        if (!minW.contains(k) || w < minW(k)) minW(k) = w
      }
    }
    val base = new Dijkstra(g)
    val r = new scala.util.Random(61)
    var crossTile = 0
    (0 until 120).foreach { _ =>
      val s = r.nextInt(g.numNodes); val t = r.nextInt(g.numNodes)
      val want = base.shortestPathMs(s, t)
      router.route(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t)) match {
        case None => assert(want == -1L, s"route $s->$t missing but flat says $want")
        case Some((ms, path)) =>
          assert(ms == want, s"route time $s->$t: got $ms want $want")
          val ids = path.map(nodeOf)
          assert(ids.head == s && ids.last == t, s"endpoints ${ids.head}->${ids.last}")
          val walked = ids.sliding(2).map {
            case Array(a, b) =>
              assert(minW.contains((a, b)), s"hop $a->$b is not a graph edge")
              minW((a, b))
            case _ => 0L
          }.sum
          assert(walked == want, s"edge-walk sum $walked != $want for $s->$t")
          if (ids.length > 1 && want > 0) crossTile += 1
      }
    }
    assert(crossTile > 50, "sample should include many real multi-hop routes")
  }

  test("tiled isochrone == flat reachableWithin at several budgets and origins") {
    val g = GridFixture.prepared("auto")
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled-iso").toString
    val router = Tiled.build(spark, nodes, edges, cells = 3, dir)
    val base = new Dijkstra(g)
    val r = new scala.util.Random(91)
    (0 until 12).foreach { _ =>
      val s = r.nextInt(g.numNodes)
      val budget = (30 + r.nextInt(900)) * 1000L
      val want = base.reachableWithin(s, budget).toMap
      val got = router.isochrone(g.nodeLat(s), g.nodeLon(s), budget)
        .map { case (id, ms) => id.toInt -> ms }.toMap
      assert(got == want,
        s"origin $s budget $budget: sizes got ${got.size} want ${want.size}; " +
          s"diff ${(got.keySet -- want.keySet) ++ (want.keySet -- got.keySet)}")
    }
  }

  test("persisted layout round-trip: Tiled.load == fresh build, CH attached") {
    val g = GridFixture.prepared("auto")
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled-rt").toString
    val built = Tiled.build(spark, nodes, edges, cells = 2, dir)
    val loaded = Tiled.load(spark, dir)
    assert(loaded.overlay.ch != null, "persisted CH must reattach on load")
    assert(loaded.overlay.size == built.overlay.size)
    val r = new scala.util.Random(41)
    (0 until 80).foreach { _ =>
      val s = r.nextInt(g.numNodes); val t = r.nextInt(g.numNodes)
      val want = built.travelTimeMs(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t))
      val got = loaded.travelTimeMs(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t))
      assert(got == want, s"round-trip mismatch $s->$t: got $got want $want")
    }
    // a corrupted CH binary must degrade to the exact Dijkstra stitch
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "overlay_ch.bin"),
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16))
    val degraded = Tiled.load(spark, dir)
    assert(degraded.overlay.ch == null, "corrupt CH must not attach")
    val base = new Dijkstra(g)
    (0 until 40).foreach { _ =>
      val s = r.nextInt(g.numNodes); val t = r.nextInt(g.numNodes)
      assert(degraded.travelTimeMs(g.nodeLat(s), g.nodeLon(s),
        g.nodeLat(t), g.nodeLon(t)) == base.shortestPathMs(s, t))
    }
  }

  test("overlay sidecar: missing/corrupt overlay.bin falls back to parquet and self-heals") {
    val g = GridFixture.prepared("auto")
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled-sc").toString
    val built = Tiled.build(spark, nodes, edges, cells = 2, dir)
    val sidecar = java.nio.file.Paths.get(dir, "overlay.bin")
    assert(java.nio.file.Files.exists(sidecar), "build must write the sidecar")
    def check(r: graft.graph.TiledRouter): Unit = {
      assert(r.overlay.size == built.overlay.size)
      val rnd = new scala.util.Random(7)
      (0 until 40).foreach { _ =>
        val s = rnd.nextInt(g.numNodes); val t = rnd.nextInt(g.numNodes)
        assert(r.travelTimeMs(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t))
          == built.travelTimeMs(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t)))
      }
    }
    // pre-sidecar layout (e.g. built by an older version): parquet path
    // loads AND writes the sidecar back — the self-heal upgrade
    java.nio.file.Files.delete(sidecar)
    check(Tiled.load(spark, dir))
    assert(java.nio.file.Files.exists(sidecar), "load must self-heal the sidecar")
    check(Tiled.load(spark, dir)) // and the healed sidecar loads identically
    // a truncated/corrupt sidecar degrades to the parquet path, never to
    // wrong answers
    java.nio.file.Files.write(sidecar, Array[Byte](71, 82, 79, 86, 0, 0))
    check(Tiled.load(spark, dir))
  }

  test("overlay sidecar: a stale sidecar from another build loses to the parquet") {
    val g = GridFixture.prepared("auto")
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled-st").toString
    // a DIFFERENT graph's layout stands in for the previous build
    // generation: its sidecar is well-formed, loads cleanly, and would
    // silently answer from the wrong overlay if it won
    val g2 = GridFixture.lattice(12)
    val (n2, e2) = dfsOf(g2)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-tiled-st2").toString
    Tiled.build(spark, n2, e2, cells = 2, dir2): Unit
    val built = Tiled.build(spark, nodes, edges, cells = 2, dir)
    // simulate a rebuild into `dir` that crashed after the parquet phase
    // but before the sidecar rewrite: an overlay.bin from another
    // generation survives beside the fresh parquet + stamp; its embedded
    // fingerprint can't match dir's stamp → load must answer from the
    // parquet, identically to the fresh build
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir2, "overlay.bin"),
      java.nio.file.Paths.get(dir, "overlay.bin"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    val loaded = Tiled.load(spark, dir)
    assert(loaded.overlay.size == built.overlay.size,
      "stale sidecar must not win over the parquet layout")
    val rnd = new scala.util.Random(11)
    (0 until 40).foreach { _ =>
      val s = rnd.nextInt(g.numNodes); val t = rnd.nextInt(g.numNodes)
      assert(loaded.travelTimeMs(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t))
        == built.travelTimeMs(g.nodeLat(s), g.nodeLon(s), g.nodeLat(t), g.nodeLon(t)))
    }
    // and the reject self-heals: the sidecar was rewritten from the parquet
    // so the NEXT load takes the fast path with the correct payload
    val healed = Tiled.load(spark, dir)
    assert(healed.overlay.size == built.overlay.size)
  }

  test("batch OD matrix over tiles == flat Dijkstra (120 pairs, 4x4 tiles)") {
    import spark.implicits._
    val g = GridFixture.lattice(40)
    val (nodes, edges) = dfsOf(g)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiled-m").toString
    val router = Tiled.build(spark, nodes, edges, cells = 4, dir)
    val r = new scala.util.Random(21)
    val pairs = (0 until 120).map(i =>
      (i.toLong, r.nextInt(g.numNodes).toLong, r.nextInt(g.numNodes).toLong))
    val out = Tiled.matrix(spark, dir, router.overlay,
        pairs.toDF("pair_id", "src", "dst"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(out.size == 120)
    val base = new Dijkstra(g)
    pairs.foreach { case (pid, s, t) =>
      val want = base.shortestPathMs(s.toInt, t.toInt)
      assert(out(pid) == want, s"pair $pid $s->$t: got ${out(pid)} want $want")
    }
    // same pairs through the Dijkstra fallback stitch (no overlay CH)
    assert(router.overlay.ch != null)
    router.overlay.ch = null
    val out2 = Tiled.matrix(spark, dir, router.overlay,
        pairs.toDF("pair_id", "src", "dst"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(out2 == out, "CH stitch and Dijkstra stitch must agree")
  }
}
