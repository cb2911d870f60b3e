package graft.algo

import graft.graph.PreparedGraph

import java.util.PriorityQueue

/** Shortest-path kernels over a [[PreparedGraph]] CSR.
  *
  * Reusable per task thread: allocate one per partition in `mapPartitions`
  * and run many queries — the Spark analogue of the reference's thread-local
  * `PathCalculator`s (reference: rust/src/lib.rs:498-533). All state arrays
  * are node-sized but reset via a generation stamp, so per-query cost is
  * O(settled), not O(V).
  */
final class Dijkstra(g: PreparedGraph) {
  private val n = g.numNodes
  private val dist = new Array[Long](n)
  private val distAccM = new Array[Double](n) // meters along the best-time path
  private val parent = new Array[Int](n)
  private val stamp = new Array[Int](n)
  private var gen = 0

  private final class QE(val node: Int, val d: Long) extends Comparable[QE] {
    def compareTo(o: QE): Int = java.lang.Long.compare(d, o.d)
  }
  private val pq = new PriorityQueue[QE]()

  @inline private def seen(v: Int): Boolean = stamp(v) == gen
  @inline private def distOf(v: Int): Long = if (seen(v)) dist(v) else Long.MaxValue

  private def reset(): Unit = { gen += 1; pq.clear() }

  private def relaxFrom(source: Int): Unit = {
    dist(source) = 0L; distAccM(source) = 0.0; parent(source) = -1; stamp(source) = gen
    pq.add(new QE(source, 0L))
  }

  /** Single-source, single-target. Returns cost in ms, or -1 if unreachable. */
  def shortestPathMs(source: Int, target: Int): Long = {
    if (source < 0 || target < 0) return -1L
    if (source == target) return 0L
    reset(); relaxFrom(source)
    while (!pq.isEmpty) {
      val top = pq.poll()
      val u = top.node
      if (top.d == distOf(u)) {
        if (u == target) return top.d
        var e = g.offsets(u)
        val eEnd = g.offsets(u + 1)
        while (e < eEnd) {
          val v = g.targets(e)
          val nd = top.d + g.weightsMs(e)
          if (nd < distOf(v)) {
            dist(v) = nd; parent(v) = u; stamp(v) = gen
            pq.add(new QE(v, nd))
          }
          e += 1
        }
      }
    }
    -1L
  }

  /** Single-source, single-target with path reconstruction.
    * Returns (costMs, nodeIds source→target), or None.
    */
  def shortestPathWithNodes(source: Int, target: Int): Option[(Long, Array[Int])] = {
    val c = shortestPathMs(source, target)
    if (c < 0) return None
    if (source == target) return Some((0L, Array(source)))
    var path = List(target)
    var cur = target
    while (cur != source) { cur = parent(cur); path = cur :: path }
    Some((c, path.toArray))
  }

  /** One-to-many: (timeMs, distM) from `source` to each of `targetNodes`
    * ((-1, -1) = unreachable). One traversal serves a whole matrix row —
    * strictly better than N independent point queries (SURVEY §3.2); search
    * stops when all targets are settled. Distance is meters along the
    * best-TIME path, matching the reference matrix semantics
    * (valhalla-wrapper/src/wrapper.cpp:260-321).
    */
  def oneToMany(source: Int, targetNodes: Array[Int]): Array[(Long, Double)] = {
    val out = Array.fill(targetNodes.length)((-1L, -1.0))
    if (source < 0) return out
    val wanted = new java.util.HashMap[Integer, java.util.ArrayList[Integer]]()
    var i = 0
    while (i < targetNodes.length) {
      val t = targetNodes(i)
      if (t == source) out(i) = (0L, 0.0)
      else if (t >= 0) {
        var l = wanted.get(t)
        if (l == null) { l = new java.util.ArrayList[Integer](); wanted.put(t, l) }
        l.add(i)
      }
      i += 1
    }
    var remaining = wanted.size()
    if (remaining == 0) return out
    reset(); relaxFrom(source)
    while (!pq.isEmpty && remaining > 0) {
      val top = pq.poll()
      val u = top.node
      if (top.d == distOf(u)) {
        val hit = wanted.remove(u)
        if (hit != null) {
          remaining -= 1
          val it = hit.iterator()
          while (it.hasNext) out(it.next()) = (top.d, distAccM(u))
        }
        var e = g.offsets(u)
        val eEnd = g.offsets(u + 1)
        while (e < eEnd) {
          val v = g.targets(e)
          val nd = top.d + g.weightsMs(e)
          if (nd < distOf(v)) {
            dist(v) = nd; distAccM(v) = distAccM(u) + g.distM(e)
            parent(v) = u; stamp(v) = gen
            pq.add(new QE(v, nd))
          }
          e += 1
        }
      }
    }
    out
  }

  /** Bounded single-source search: every node reachable within `maxMs`,
    * with its cost. The isochrone kernel (reference: rust/src/lib.rs:639-720).
    */
  def reachableWithin(source: Int, maxMs: Long): Array[(Int, Long)] = {
    if (source < 0) return Array.empty
    reset(); relaxFrom(source)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    while (!pq.isEmpty) {
      val top = pq.poll()
      val u = top.node
      if (top.d == distOf(u) && top.d <= maxMs) {
        out += ((u, top.d))
        var e = g.offsets(u)
        val eEnd = g.offsets(u + 1)
        while (e < eEnd) {
          val v = g.targets(e)
          val nd = top.d + g.weightsMs(e)
          if (nd <= maxMs && nd < distOf(v)) {
            dist(v) = nd; parent(v) = u; stamp(v) = gen
            pq.add(new QE(v, nd))
          }
          e += 1
        }
      }
    }
    out.toArray
  }

  /** Bounded single-source search by DISTANCE: every node reachable within
    * `maxMeters` along a minimum-distance path, with its distance in
    * meters — the kernel for Valhalla's `contours[].distance` isochrones
    * (a different metric, not a rescaled time: the min-distance tree can
    * route through slow roads the min-time tree avoids). Costs carry as
    * integer millimeters in the shared dist array.
    */
  def reachableWithinDistM(source: Int, maxMeters: Double): Array[(Int, Double)] = {
    if (source < 0) return Array.empty
    reset(); relaxFrom(source)
    val maxMm = math.round(maxMeters * 1000.0)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    while (!pq.isEmpty) {
      val top = pq.poll()
      val u = top.node
      if (top.d == distOf(u) && top.d <= maxMm) {
        out += ((u, top.d / 1000.0))
        var e = g.offsets(u)
        val eEnd = g.offsets(u + 1)
        while (e < eEnd) {
          val v = g.targets(e)
          val nd = top.d + math.round(g.distM(e).toDouble * 1000.0)
          if (nd <= maxMm && nd < distOf(v)) {
            dist(v) = nd; parent(v) = u; stamp(v) = gen
            pq.add(new QE(v, nd))
          }
          e += 1
        }
      }
    }
    out.toArray
  }

  /** Sum of per-edge haversine distances along a node path, in meters
    * (reference: rust/src/lib.rs:789-795).
    */
  /** Single-source, single-target that never ENTERS a blocked node — the
    * exclude_locations semantic (endpoints exempt: the target is always
    * enterable, the source is where the search starts). Same contract as
    * [[shortestPathWithNodes]] otherwise; the per-edge membership probe is
    * confined to this variant so the unblocked kernels stay probe-free.
    */
  def shortestPathWithNodesAvoiding(source: Int, target: Int,
      blocked: java.util.HashSet[Integer]): Option[(Long, Array[Int])] = {
    if (source < 0 || target < 0) return None
    if (source == target) return Some((0L, Array(source)))
    reset(); relaxFrom(source)
    var found = -1L
    while (found < 0 && !pq.isEmpty) {
      val top = pq.poll()
      val u = top.node
      if (top.d == distOf(u)) {
        if (u == target) found = top.d
        else {
          var e = g.offsets(u)
          val eEnd = g.offsets(u + 1)
          while (e < eEnd) {
            val v = g.targets(e)
            if (v == target || !blocked.contains(v)) {
              val nd = top.d + g.weightsMs(e)
              if (nd < distOf(v)) {
                dist(v) = nd; parent(v) = u; stamp(v) = gen
                pq.add(new QE(v, nd))
              }
            }
            e += 1
          }
        }
      }
    }
    if (found < 0) return None
    var path = List(target)
    var cur = target
    while (cur != source) { cur = parent(cur); path = cur :: path }
    Some((found, path.toArray))
  }

  def pathDistanceM(path: Array[Int]): Double = {
    var d = 0.0
    var i = 1
    while (i < path.length) {
      d += graft.geo.Geo.haversineM(
        g.nodeLat(path(i - 1)), g.nodeLon(path(i - 1)),
        g.nodeLat(path(i)), g.nodeLon(path(i)))
      i += 1
    }
    d
  }
}
