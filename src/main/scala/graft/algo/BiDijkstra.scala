package graft.algo

import graft.graph.PreparedGraph
import java.util.PriorityQueue

/** Bidirectional Dijkstra over the forward + reverse CSR: alternating
  * searches meet in the middle, settling ~2·√V nodes instead of V on
  * uniform graphs. Point-to-point only (the one-to-many matrix kernel keeps
  * single-source Dijkstra, which already amortizes a whole row per
  * traversal).
  *
  * Same semantic contract as [[Dijkstra.shortestPathMs]]: cost in ms, -1 when
  * unreachable (reference: fast_paths bidirectional CH query,
  * rust/src/lib.rs:421-424 — this is the uncontracted analogue; CH proper is
  * [[ContractionHierarchy]]).
  */
final class BiDijkstra(g: PreparedGraph) {
  private val n = g.numNodes
  private val distF = new Array[Long](n)
  private val distB = new Array[Long](n)
  private val stampF = new Array[Int](n)
  private val stampB = new Array[Int](n)
  private var gen = 0

  private final class QE(val node: Int, val d: Long) extends Comparable[QE] {
    def compareTo(o: QE): Int = java.lang.Long.compare(d, o.d)
  }
  private val pqF = new PriorityQueue[QE]()
  private val pqB = new PriorityQueue[QE]()

  @inline private def dF(v: Int): Long = if (stampF(v) == gen) distF(v) else Long.MaxValue
  @inline private def dB(v: Int): Long = if (stampB(v) == gen) distB(v) else Long.MaxValue

  def shortestPathMs(source: Int, target: Int): Long = {
    if (source < 0 || target < 0) return -1L
    if (source == target) return 0L
    gen += 1; pqF.clear(); pqB.clear()
    distF(source) = 0L; stampF(source) = gen; pqF.add(new QE(source, 0L))
    distB(target) = 0L; stampB(target) = gen; pqB.add(new QE(target, 0L))
    var best = Long.MaxValue

    // alternate; stop when topF + topB >= best (standard bidirectional bound)
    while (!pqF.isEmpty && !pqB.isEmpty &&
      pqF.peek().d + pqB.peek().d < best) {
      if (pqF.peek().d <= pqB.peek().d) {
        val top = pqF.poll()
        val u = top.node
        if (top.d == dF(u)) {
          if (dB(u) != Long.MaxValue) best = math.min(best, top.d + dB(u))
          var e = g.offsets(u); val eEnd = g.offsets(u + 1)
          while (e < eEnd) {
            val v = g.targets(e)
            val nd = top.d + g.weightsMs(e)
            if (nd < dF(v)) {
              distF(v) = nd; stampF(v) = gen; pqF.add(new QE(v, nd))
              if (dB(v) != Long.MaxValue) best = math.min(best, nd + dB(v))
            }
            e += 1
          }
        }
      } else {
        val top = pqB.poll()
        val u = top.node
        if (top.d == dB(u)) {
          if (dF(u) != Long.MaxValue) best = math.min(best, top.d + dF(u))
          var e = g.rOffsets(u); val eEnd = g.rOffsets(u + 1)
          while (e < eEnd) {
            val v = g.rTargets(e)
            val nd = top.d + g.rWeightsMs(e)
            if (nd < dB(v)) {
              distB(v) = nd; stampB(v) = gen; pqB.add(new QE(v, nd))
              if (dF(v) != Long.MaxValue) best = math.min(best, nd + dF(v))
            }
            e += 1
          }
        }
      }
    }
    if (best == Long.MaxValue) -1L else best
  }
}
