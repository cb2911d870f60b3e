package graft.algo

import graft.graph.PreparedGraph
import java.util.PriorityQueue
import scala.collection.mutable.ArrayBuffer

/** Contraction hierarchies — the reference's query-time accelerator
  * (`fast_paths::prepare` / `calc_path`, rust/src/lib.rs:260,421-424),
  * reimplemented natively:
  *
  *  - **prepare** (driver-side, before broadcast): contract nodes in
  *    importance order (edge-difference + deleted-neighbors heuristic, lazy
  *    heap); for every (in u, out x) pair through the contracted node add a
  *    shortcut u→x unless a bounded witness search finds a shorter detour.
  *  - **query** (executor-side, per-thread scratch): bidirectional Dijkstra
  *    that only relaxes edges toward higher-ranked nodes; the best meeting
  *    node gives the exact shortest distance.
  *
  * The prepared structure is immutable flat arrays — broadcast-friendly,
  * read lock-free by every task thread like the base CSR.
  */
final class ChGraph(
    val n: Int,
    val rank: Array[Int],
    // upward adjacency in the augmented graph (original + shortcuts):
    // edges u -> v with rank(v) > rank(u)
    val upOff: Array[Int], val upTgt: Array[Int], val upW: Array[Int],
    // downward-reverse adjacency: for backward search from t — edges v -> u
    // meaning (u -> v) exists in augmented graph and rank(u) > rank(v)
    val dnOff: Array[Int], val dnTgt: Array[Int], val dnW: Array[Int]
) extends Serializable {
  def numShortcuts(baseEdges: Int): Int = (upTgt.length + dnTgt.length) - baseEdges
}

object ContractionHierarchy {

  /** Geometric nested-dissection depth per node: recursively bisect the
    * node cloud at the median of the wider coordinate axis; nodes with a
    * graph edge crossing the cut form the (approximate) separator and keep
    * the current recursion depth, halves recurse one level deeper.
    *
    * Separators are contracted LAST (depth 0 = top separator = most
    * important). Pure edge-difference ordering cascades on grid-like cores —
    * every contraction raises its neighbours' degree until shortcut counts
    * explode quadratically; dissection ordering bounds shortcut growth at
    * O(n log n) on planar-ish road networks (the classical nested-dissection
    * result), which is what makes >5k-node lattices buildable in seconds.
    * Road graphs are geometrically planar-ish, so the coordinate bisection
    * is a good separator proxy with none of the graph-partitioning cost.
    */
  private[algo] def dissectionDepth(g: PreparedGraph): Array[Int] = {
    val n = g.numNodes
    val depth = new Array[Int](n)
    val idx = Array.tabulate(n)(identity)
    val regionStamp = new Array[Int](n) // generation stamp: node in current region
    val rightStamp = new Array[Int](n)  // generation stamp: node in right half
    var gen = 0
    val leafSize = 32
    var stack = List((0, n, 0))
    val left = new ArrayBuffer[Int](); val right = new ArrayBuffer[Int]()
    val sep = new ArrayBuffer[Int]()
    while (stack.nonEmpty) {
      val (s, e, level) = stack.head; stack = stack.tail
      val len = e - s
      if (len <= leafSize) {
        var i = s; while (i < e) { depth(idx(i)) = level; i += 1 }
      } else {
        // wider bbox axis decides the cut direction
        var minLat = Double.MaxValue; var maxLat = -Double.MaxValue
        var minLon = Double.MaxValue; var maxLon = -Double.MaxValue
        var i = s
        while (i < e) {
          val v = idx(i)
          if (g.nodeLat(v) < minLat) minLat = g.nodeLat(v)
          if (g.nodeLat(v) > maxLat) maxLat = g.nodeLat(v)
          if (g.nodeLon(v) < minLon) minLon = g.nodeLon(v)
          if (g.nodeLon(v) > maxLon) maxLon = g.nodeLon(v)
          i += 1
        }
        val byLat = (maxLat - minLat) >= (maxLon - minLon)
        val slice = idx.slice(s, e)
          .sortBy(v => if (byLat) g.nodeLat(v) else g.nodeLon(v))
        val mid = len / 2
        gen += 1
        i = 0
        while (i < len) {
          regionStamp(slice(i)) = gen
          if (i >= mid) rightStamp(slice(i)) = gen
          i += 1
        }
        // one-sided separator: LEFT-half nodes with a region-internal edge
        // (either direction) into the right half. Removing them cuts every
        // crossing edge, and a one-sided separator is half as thick as
        // taking both endpoints — separator size directly drives the
        // shortcut clique each level leaves behind.
        def crosses(v: Int): Boolean = {
          var k = g.offsets(v)
          while (k < g.offsets(v + 1)) {
            val t = g.targets(k)
            if (regionStamp(t) == gen && rightStamp(t) == gen) return true
            k += 1
          }
          k = g.rOffsets(v)
          while (k < g.rOffsets(v + 1)) {
            val t = g.rTargets(k)
            if (regionStamp(t) == gen && rightStamp(t) == gen) return true
            k += 1
          }
          false
        }
        left.clear(); right.clear(); sep.clear()
        i = 0
        while (i < len) {
          val v = slice(i)
          if (i < mid && crosses(v)) sep += v
          else if (i < mid) left += v
          else right += v
          i += 1
        }
        // write back: [left | right | separator]; separator keeps this level
        var p = s
        left.foreach { v => idx(p) = v; p += 1 }
        val leftEnd = p
        right.foreach { v => idx(p) = v; p += 1 }
        val rightEnd = p
        sep.foreach { v => idx(p) = v; depth(v) = level; p += 1 }
        if (leftEnd > s) stack = (s, leftEnd, level + 1) :: stack
        if (rightEnd > leftEnd) stack = (leftEnd, rightEnd, level + 1) :: stack
      }
    }
    depth
  }

  /** Build a CH over the prepared graph. `witnessSettleLimit` bounds each
    * witness search (correctness is kept: an aborted witness search just adds
    * a redundant — never wrong — shortcut); `prioritySettleLimit` is the
    * cheaper bound used for the node-ordering estimates, where precision only
    * shapes the order, never correctness.
    */
  def build(g: PreparedGraph, witnessSettleLimit: Int = 800,
            prioritySettleLimit: Int = 25): ChGraph = {
    val n = g.numNodes
    // mutable adjacency, min-merged ON INSERT: buffers hold at most one
    // entry per live neighbor. Blind appends (round 1) let parallel
    // shortcuts accumulate — on dense late-contraction cores every witness
    // settle then scans thousands of duplicate entries, which is what blew
    // a 10k-node lattice build to ~6 minutes.
    val out = Array.fill(n)(new ArrayBuffer[(Int, Int)]()) // (target, w)
    val in = Array.fill(n)(new ArrayBuffer[(Int, Int)]())  // (source, w)
    def addMin(buf: ArrayBuffer[(Int, Int)], t: Int, w: Int): Unit = {
      var i = 0
      while (i < buf.length) {
        if (buf(i)._1 == t) { if (w < buf(i)._2) buf(i) = ((t, w)); return }
        i += 1
      }
      buf += ((t, w))
    }
    var u = 0
    while (u < n) {
      var e = g.offsets(u)
      while (e < g.offsets(u + 1)) {
        val v = g.targets(e); val w = g.weightsMs(e)
        if (v != u) { addMin(out(u), v, w); addMin(in(v), u, w) }
        e += 1
      }
      u += 1
    }

    val contracted = new Array[Boolean](n)
    val deletedNeighbors = new Array[Int](n)
    val rank = new Array[Int](n)

    // per-build witness-search scratch; PQ entries are (dist << 24 | node)
    // packed into one Long — no allocation per push. 24 node bits (16M
    // nodes) leave 39 distance bits; witness distances are sums of two Int
    // edge weights (< 2^33), far under the 2^39 cap, and the cap is enforced
    // below so a corrupt weight can never overflow into the node bits.
    require(n < (1 << 24), s"CH build supports < 16M nodes per packed-PQ entry; got $n")
    val maxPackedDist = (1L << 39) - 1
    val wDist = new Array[Long](n)
    val wStamp = new Array[Int](n)
    var wGen = 0
    val wPq = new PriorityQueue[java.lang.Long]()

    /** shortest u->x distance avoiding `skip`, capped at `limit`; MaxValue if
      * none found within bounds.
      */
    def witness(src: Int, targetSet: java.util.HashMap[Integer, Integer],
                skip: Int, limit: Long, settleLimit: Int): Unit = {
      wGen += 1; wPq.clear()
      wDist(src) = 0L; wStamp(src) = wGen
      wPq.add(java.lang.Long.valueOf(src.toLong))
      var settled = 0
      var remaining = targetSet.size()
      while (!wPq.isEmpty && settled < settleLimit && remaining > 0) {
        val top = wPq.poll().longValue()
        val d = top >>> 24; val v = (top & 0xFFFFFF).toInt
        if (wStamp(v) == wGen && d == wDist(v)) {
          settled += 1
          if (d > limit) return
          if (targetSet.containsKey(v) && d <= targetSet.get(v)) {
            targetSet.remove(v); remaining -= 1 // witness found for this target
          }
          val buf = out(v)
          var i = 0
          while (i < buf.length) {
            val (t, w) = buf(i)
            if (!contracted(t) && t != skip) {
              val nd = d + w
              if (nd <= limit && nd <= maxPackedDist &&
                  (wStamp(t) != wGen || nd < wDist(t))) {
                wDist(t) = nd; wStamp(t) = wGen
                wPq.add(java.lang.Long.valueOf((nd << 24) | t))
              }
            }
            i += 1
          }
        }
      }
    }

    /** Shortcut pairs needed if `v` were contracted now; when `commit`, add
      * them to the adjacency. Returns the number of shortcuts. Buffers are
      * min-merged and purged of contracted neighbors, so they iterate live
      * entries directly — no per-call grouping allocations.
      */
    def contractionShortcuts(v: Int, commit: Boolean): Int = {
      val ins = in(v); val outs = out(v)
      if (ins.isEmpty || outs.isEmpty) return 0
      // dense contractions (the top separator clique) skip witness pruning:
      // unpruned shortcuts are redundant, never wrong, and in a near-clique
      // witnesses rarely prune anyway — paying in-degree × settle × degree
      // there is what turned lattice builds superlinear (O(k^3) on a k-wide
      // top separator)
      val settleLimit =
        if (!commit) prioritySettleLimit
        else if (ins.length.toLong * outs.length > 16384) 0
        else witnessSettleLimit
      var added = 0
      ins.foreach { case (uu, w1) =>
        // one witness search from uu covers every out-target
        val targets = new java.util.HashMap[Integer, Integer]()
        var maxW = 0L
        outs.foreach { case (x, w2) =>
          if (x != uu) { targets.put(x, w1 + w2); maxW = math.max(maxW, (w1 + w2).toLong) }
        }
        if (!targets.isEmpty) {
          witness(uu, targets, v, maxW, settleLimit)
          // targets that survive have NO witness <= via-v cost: need shortcut
          val it = targets.entrySet().iterator()
          while (it.hasNext) {
            val en = it.next()
            val x = en.getKey.intValue; val w = en.getValue.intValue
            added += 1
            if (commit) {
              addMin(out(uu), x, w); addMin(in(x), uu, w)
            }
          }
        }
      }
      added
    }

    /** Ordering: nested-dissection depth dominates (deeper/leaf nodes
      * contract first, separator levels last — the Customizable-CH ordering
      * discipline), with a witness-FREE edge-difference estimate
      * (in×out pair count) breaking ties within a level. Witness searches
      * run only once per contraction at commit time: running them inside the
      * priority function too (round 1) made every lazy-heap re-evaluation a
      * Dijkstra and pushed a 10k-node lattice build past 5 minutes. The
      * round-1 observation that witness-free ordering destroys hierarchy
      * quality applied to witness-free ordering WITHOUT the dissection bias;
      * with depth dominating, the tie-break precision no longer shapes the
      * global hierarchy.
      */
    val ndDepth = dissectionDepth(g)
    val maxDepth = if (n == 0) 0 else ndDepth.max
    def priority(v: Int): Int = {
      val ins = in(v).iterator.map(_._1).distinct.size
      val outs = out(v).iterator.map(_._1).distinct.size
      val local = ins * outs - ins - outs + 2 * deletedNeighbors(v)
      // clamp so edge-difference can never cross a dissection-level boundary
      (maxDepth - ndDepth(v)) * 1000000 + math.min(math.max(local, -499999), 499999)
    }

    // lazy-update heap
    val heap = new PriorityQueue[Array[Int]]((a, b) => Integer.compare(a(0), b(0)))
    var v = 0
    while (v < n) { heap.add(Array(priority(v), v)); v += 1 }
    var order = 0
    while (!heap.isEmpty) {
      val top = heap.poll()
      val node = top(1)
      if (!contracted(node)) {
        val p = priority(node)
        if (!heap.isEmpty && p > heap.peek()(0)) heap.add(Array(p, node))
        else {
          contractionShortcuts(node, commit = true)
          contracted(node) = true
          rank(node) = order; order += 1
          // purge the contracted node from neighbor adjacency so later
          // filters and witness scans stay proportional to LIVE degree —
          // without this, grid graphs cascade into quadratic adjacency scans
          in(node).foreach { case (s, _) =>
            if (!contracted(s)) {
              deletedNeighbors(s) += 1
              out(s).filterInPlace(_._1 != node)
            }
          }
          out(node).foreach { case (t, _) =>
            if (!contracted(t)) {
              deletedNeighbors(t) += 1
              in(t).filterInPlace(_._1 != node)
            }
          }
        }
      }
    }

    // split augmented adjacency into upward / downward-reverse CSRs
    def toCsr(select: Int => Iterable[(Int, Int)]): (Array[Int], Array[Int], Array[Int]) = {
      val off = new Array[Int](n + 1)
      var i = 0
      while (i < n) { off(i + 1) = off(i) + select(i).size; i += 1 }
      val tgt = new Array[Int](off(n)); val w = new Array[Int](off(n))
      i = 0
      while (i < n) {
        var p = off(i)
        select(i).foreach { case (t, ww) => tgt(p) = t; w(p) = ww; p += 1 }
        i += 1
      }
      (off, tgt, w)
    }
    // min-merge parallel edges per (node, target)
    def dedupMin(buf: ArrayBuffer[(Int, Int)], pred: Int => Boolean): Iterable[(Int, Int)] =
      buf.filter(p => pred(p._1)).groupMapReduce(_._1)(_._2)(math.min)

    val (uo, ut, uw) = toCsr(i => dedupMin(out(i), t => rank(t) > rank(i)))
    val (dno, dnt, dnw) = toCsr(i => dedupMin(in(i), s => rank(s) > rank(i)))
    new ChGraph(n, rank, uo, ut, uw, dno, dnt, dnw)
  }
}

/** Per-thread CH query scratch (same reuse pattern as [[Dijkstra]]). */
final class ChQuery(ch: ChGraph) {
  private val n = ch.n
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

  def shortestPathMs(source: Int, target: Int): Long = {
    if (source < 0 || target < 0) return -1L
    if (source == target) return 0L
    gen += 1
    pqF.clear(); pqB.clear()
    distF(source) = 0L; stampF(source) = gen; pqF.add(new QE(source, 0L))
    distB(target) = 0L; stampB(target) = gen; pqB.add(new QE(target, 0L))
    var best = Long.MaxValue
    // both searches must run to exhaustion of the bound (CH stall condition
    // kept simple: stop a side when its top exceeds best)
    while ((!pqF.isEmpty && pqF.peek().d < best) || (!pqB.isEmpty && pqB.peek().d < best)) {
      if (!pqF.isEmpty && pqF.peek().d < best) {
        val top = pqF.poll(); val u = top.node
        if (stampF(u) == gen && top.d == distF(u)) {
          if (stampB(u) == gen) best = math.min(best, top.d + distB(u))
          var e = ch.upOff(u)
          while (e < ch.upOff(u + 1)) {
            val vv = ch.upTgt(e); val nd = top.d + ch.upW(e)
            if (stampF(vv) != gen || nd < distF(vv)) {
              distF(vv) = nd; stampF(vv) = gen; pqF.add(new QE(vv, nd))
            }
            e += 1
          }
        }
      }
      if (!pqB.isEmpty && pqB.peek().d < best) {
        val top = pqB.poll(); val u = top.node
        if (stampB(u) == gen && top.d == distB(u)) {
          if (stampF(u) == gen) best = math.min(best, top.d + distF(u))
          var e = ch.dnOff(u)
          while (e < ch.dnOff(u + 1)) {
            val vv = ch.dnTgt(e); val nd = top.d + ch.dnW(e)
            if (stampB(vv) != gen || nd < distB(vv)) {
              distB(vv) = nd; stampB(vv) = gen; pqB.add(new QE(vv, nd))
            }
            e += 1
          }
        }
      }
    }
    if (best == Long.MaxValue) -1L else best
  }
}
