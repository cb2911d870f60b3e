package graft

import graft.algo.{ChQuery, Dijkstra, DistributedCh}
import graft.graph.GridFixture
import org.scalatest.funsuite.AnyFunSuite

/** Exactness of the cluster-distributed CH build: per-tile interior
  * contraction in executors + boundary remainder on the driver must yield a
  * hierarchy whose queries equal plain Dijkstra — including the oneway
  * asymmetries of the grid fixture, disconnected pairs, and a single-tile
  * degenerate layout (no boundary at all).
  */
class DistributedChSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def checkExact(g: graft.graph.PreparedGraph, cells: Int,
                         pairs: Int, seed: Int): Unit = {
    val ch = DistributedCh.build(spark, g, cells)
    val q = new ChQuery(ch)
    val base = new Dijkstra(g)
    val r = new scala.util.Random(seed)
    (0 until pairs).foreach { _ =>
      val s = r.nextInt(g.numNodes); val t = r.nextInt(g.numNodes)
      val want = base.shortestPathMs(s, t)
      val got = q.shortestPathMs(s, t)
      assert(got == want, s"distributed CH mismatch $s->$t: got $got want $want")
    }
    info(s"n=${g.numNodes} cells=${cells}x$cells " +
      s"augmented=${ch.upTgt.length + ch.dnTgt.length} edges (base ${g.numEdges})")
  }

  test("grid fixture (oneway top row): distributed CH == Dijkstra, 2x2 tiles") {
    checkExact(GridFixture.prepared("auto"), cells = 2, pairs = 250, seed = 31)
  }

  test("40x40 lattice: distributed CH == Dijkstra, 4x4 tiles") {
    checkExact(GridFixture.lattice(40), cells = 4, pairs = 150, seed = 32)
  }

  test("single tile degenerates to a full local contraction (no boundary)") {
    checkExact(GridFixture.prepared("auto"), cells = 1, pairs = 120, seed = 33)
  }

  test("60x60 lattice: distributed build wall-clock sanity, 3x3 tiles") {
    val g = GridFixture.lattice(60)
    val t0 = System.nanoTime()
    val ch = DistributedCh.build(spark, g, cells = 3)
    val buildMs = (System.nanoTime() - t0) / 1e6
    val q = new ChQuery(ch)
    val base = new Dijkstra(g)
    val r = new scala.util.Random(34)
    (0 until 80).foreach { _ =>
      val s = r.nextInt(g.numNodes); val t = r.nextInt(g.numNodes)
      assert(q.shortestPathMs(s, t) == base.shortestPathMs(s, t))
    }
    info(f"60x60: distributed build $buildMs%.0f ms")
  }
}
