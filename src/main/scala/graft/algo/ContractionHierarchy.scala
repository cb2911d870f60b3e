package graft.algo

import graft.graph.PreparedGraph
import java.util.PriorityQueue
import scala.collection.mutable.ArrayBuffer

/** Contraction hierarchies — the reference's query-time accelerator
  * (`fast_paths::prepare` / `calc_path`, rust/src/lib.rs:260,421-424),
  * reimplemented natively:
  *
  *  - **prepare** (driver-side, before broadcast): geometric nested
  *    dissection decomposes the node cloud into a region tree; region
  *    interiors contract before their separators (the Customizable-CH
  *    ordering discipline), sibling regions contract in fork-join PARALLEL
  *    (their interiors are vertex-disjoint and non-adjacent, see
  *    [[ContractionHierarchy.dissect]]). For every (in u, out x) pair
  *    through a contracted node a shortcut u→x is added unless a bounded
  *    witness search finds a shorter detour.
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

  /** Mutable neighbor buffer, min-merged ON INSERT: at most one entry per
    * live neighbor, holding the cheapest weight seen. Small buffers are
    * parallel int arrays with linear-probe lookup; past [[NB.Spill]] live
    * entries the buffer spills to a hash map. The spill is what keeps dense
    * separator-clique contraction at O(k^3): with linear probes each of the
    * O(k^2) shortcut inserts scans an O(k) buffer — O(k^4) total, and the
    * measured reason 40k-node lattice builds took minutes.
    */
  private[algo] final class NB {
    private var ts: Array[Int] = null
    private var ws: Array[Int] = null
    private var len = 0
    private var map: java.util.HashMap[Integer, Integer] = null

    def size: Int = if (map != null) map.size else len
    def isEmpty: Boolean = size == 0

    def addMin(t: Int, w: Int): Unit = {
      if (map != null) {
        val old = map.get(t)
        if (old == null || w < old.intValue) map.put(t, w)
      } else {
        var i = 0
        while (i < len) {
          if (ts(i) == t) { if (w < ws(i)) ws(i) = w; return }
          i += 1
        }
        if (ts == null) { ts = new Array[Int](4); ws = new Array[Int](4) }
        else if (len == ts.length) {
          if (len >= NB.Spill) {
            map = new java.util.HashMap[Integer, Integer](len * 2)
            i = 0
            while (i < len) { map.put(ts(i), ws(i)); i += 1 }
            ts = null; ws = null
            map.put(t, w)
            return
          }
          val nts = new Array[Int](len * 2); val nws = new Array[Int](len * 2)
          System.arraycopy(ts, 0, nts, 0, len); System.arraycopy(ws, 0, nws, 0, len)
          ts = nts; ws = nws
        }
        ts(len) = t; ws(len) = w; len += 1
      }
    }

    def remove(t: Int): Unit = {
      if (map != null) { map.remove(t); () }
      else {
        var i = 0
        while (i < len) {
          if (ts(i) == t) { len -= 1; ts(i) = ts(len); ws(i) = ws(len); return }
          i += 1
        }
      }
    }

    def foreach(f: (Int, Int) => Unit): Unit = {
      if (map != null) {
        val it = map.entrySet().iterator()
        while (it.hasNext) { val e = it.next(); f(e.getKey.intValue, e.getValue.intValue) }
      } else {
        var i = 0
        while (i < len) { f(ts(i), ws(i)); i += 1 }
      }
    }

    /** Compacted copy — the only safe way to read a buffer owned by another
      * region (taken under the node's stripe lock).
      */
    def toArrays: (Array[Int], Array[Int]) = {
      val m = size
      val a = new Array[Int](m); val b = new Array[Int](m)
      var i = 0
      foreach { (t, w) => a(i) = t; b(i) = w; i += 1 }
      (a, b)
    }
  }
  private[algo] object NB { final val Spill = 64 }

  /** Region of the nested-dissection tree: nodes at idx positions [s, e),
    * laid out [left-child | right-child | separator], separator at
    * [sepStart, e). Children null for leaves (whole range is "separator").
    */
  private[algo] final case class Region(s: Int, e: Int, sepStart: Int,
                                        left: Region, right: Region)

  /** Geometric nested dissection: recursively bisect the node cloud at the
    * median of the wider coordinate axis; LEFT-half nodes with a
    * region-internal edge (either direction) into the right half form the
    * (one-sided) separator. Removing them cuts every crossing edge, and a
    * one-sided separator is half as thick as taking both endpoints.
    *
    * Separators contract LAST (the classical nested-dissection ordering) —
    * pure edge-difference ordering cascades on grid-like cores, exploding
    * shortcut counts quadratically; dissection bounds shortcut growth at
    * O(n log n) on planar-ish road networks.
    *
    * The one-sided rule also gives the parallel-safety invariant: every
    * edge between the two halves has its left endpoint pulled into the
    * separator, so after the split NO edge connects left-interior to
    * right-interior — sibling subtrees are vertex-disjoint AND non-adjacent,
    * and can contract concurrently touching only their own nodes plus
    * ancestor separators.
    */
  private[algo] def dissect(g: PreparedGraph): (Array[Int], Region) = {
    val n = g.numNodes
    val idx = Array.tabulate(n)(identity)
    val regionStamp = new Array[Int](n) // generation stamp: node in current region
    val rightStamp = new Array[Int](n)  // generation stamp: node in right half
    var gen = 0
    val leafSize = 32
    val left = new ArrayBuffer[Int](); val right = new ArrayBuffer[Int]()
    val sep = new ArrayBuffer[Int]()

    def rec(s: Int, e: Int): Region = {
      val len = e - s
      if (len <= leafSize) return Region(s, e, s, null, null)
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
      val myGen = gen // recursion below reuses the stamp arrays
      def crosses(v: Int): Boolean = {
        var k = g.offsets(v)
        while (k < g.offsets(v + 1)) {
          val t = g.targets(k)
          if (regionStamp(t) == myGen && rightStamp(t) == myGen) return true
          k += 1
        }
        k = g.rOffsets(v)
        while (k < g.rOffsets(v + 1)) {
          val t = g.rTargets(k)
          if (regionStamp(t) == myGen && rightStamp(t) == myGen) return true
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
      // write back: [left | right | separator]
      var p = s
      left.foreach { v => idx(p) = v; p += 1 }
      val leftEnd = p
      right.foreach { v => idx(p) = v; p += 1 }
      val rightEnd = p
      sep.foreach { v => idx(p) = v; p += 1 }
      val l = if (leftEnd > s) rec(s, leftEnd) else null
      val r = if (rightEnd > leftEnd) rec(leftEnd, rightEnd) else null
      Region(s, e, rightEnd, l, r)
    }
    (idx, rec(0, n))
  }

  /** Build a CH over the prepared graph. `witnessSettleLimit` bounds each
    * witness search (correctness is kept: an aborted witness search just adds
    * a redundant — never wrong — shortcut). Ordering is witness-free
    * (dissection structure + degree tie-break), so there is no priority-side
    * settle budget. `parallelism` caps the fork-join pool; 0 = all cores.
    *
    * Parallel-safety argument (audited invariants):
    *  - A region task runs only while its children have joined and its
    *    ancestors wait — so it EXCLUSIVELY owns its idx range [s, e): no
    *    other live task reads or writes buffers, `contracted`, or heap state
    *    of nodes in that range.
    *  - Concurrent tasks are range-disjoint siblings/cousins; dissection
    *    guarantees no edge ever connects their interiors, so shortcuts and
    *    witness paths never couple them except through common ANCESTOR
    *    separators — whose buffers are only touched under per-node stripe
    *    locks (addMin / remove / snapshot-read).
    *  - Witness searches relax into any live node but EXPAND only nodes the
    *    task owns; a search seeded from an ancestor separator reads that
    *    one buffer as a locked snapshot. Restricting expansion (or missing
    *    a concurrent sibling's shortcut) can only fail to find a witness —
    *    adding a redundant, never wrong, shortcut.
    *  - `rank` is the atomic contraction-commit order. Concurrently
    *    contracted nodes are never adjacent (and never become adjacent: a
    *    shortcut endpoint is a live neighbor, always own-region or
    *    ancestor), so their relative rank cannot affect any query; every
    *    adjacent pair is ordered by the region tree's sequential spine.
    */
  def build(g: PreparedGraph, witnessSettleLimit: Int = 800,
            parallelism: Int = 0): ChGraph = {
    val n = g.numNodes
    // PQ entries are (dist << 24 | node) packed into one Long — no
    // allocation per push. 24 node bits (16M nodes) leave 39 distance bits;
    // witness distances are sums of two Int edge weights (< 2^33), far under
    // the 2^39 cap, and the cap is enforced below so a corrupt weight can
    // never overflow into the node bits.
    require(n < (1 << 24), s"CH build supports < 16M nodes per packed-PQ entry; got $n")
    val maxPackedDist = (1L << 39) - 1

    val (idx, root) = dissect(g)
    val pos = new Array[Int](n)
    var i = 0
    while (i < n) { pos(idx(i)) = i; i += 1 }

    val out = new Array[NB](n); val in = new Array[NB](n)
    i = 0
    while (i < n) { out(i) = new NB; in(i) = new NB; i += 1 }
    var u = 0
    while (u < n) {
      var e = g.offsets(u)
      while (e < g.offsets(u + 1)) {
        val v = g.targets(e); val w = g.weightsMs(e)
        if (v != u) { out(u).addMin(v, w); in(v).addMin(u, w) }
        e += 1
      }
      u += 1
    }

    val contracted = new Array[Boolean](n)
    val deletedNeighbors = new java.util.concurrent.atomic.AtomicIntegerArray(n)
    val rank = new Array[Int](n)
    val orderCtr = new java.util.concurrent.atomic.AtomicInteger(0)
    // stripe locks guard buffers of nodes OUTSIDE the mutating task's range
    // (ancestor separators). One lock held at a time — no deadlock.
    val locks: Array[Object] = Array.fill(256)(new Object)
    @inline def lockOf(v: Int): Object = locks(v & 255)

    // per-THREAD witness scratch (fork-join reuses threads across tasks)
    final class Scratch {
      val wDist = new Array[Long](n)
      val wStamp = new Array[Int](n)
      var wGen = 0
      val wPq = new PriorityQueue[java.lang.Long]()
    }
    val scratchTl: ThreadLocal[Scratch] =
      ThreadLocal.withInitial(() => new Scratch)

    /** Remove from `targetSet` every target with a detour (avoiding `skip`)
      * no costlier than its via-`skip` cost. Seeded from a snapshot of the
      * source's adjacency; expands only nodes in the owned range [insS,insE).
      */
    def witness(sc: Scratch, srcTs: Array[Int], srcWs: Array[Int],
                targetSet: java.util.HashMap[Integer, Integer], skip: Int,
                limit: Long, settleLimit: Int, insS: Int, insE: Int): Unit = {
      sc.wGen += 1
      val gen = sc.wGen
      sc.wPq.clear()
      var remaining = targetSet.size()
      var k = 0
      while (k < srcTs.length) {
        val t = srcTs(k); val w = srcWs(k)
        if (t != skip && !contracted(t)) {
          val nd = w.toLong
          if (nd <= limit && nd <= maxPackedDist &&
              (sc.wStamp(t) != gen || nd < sc.wDist(t))) {
            sc.wDist(t) = nd; sc.wStamp(t) = gen
            sc.wPq.add(java.lang.Long.valueOf((nd << 24) | t))
          }
        }
        k += 1
      }
      var settled = 0
      while (!sc.wPq.isEmpty && settled < settleLimit && remaining > 0) {
        val top = sc.wPq.poll().longValue()
        val d = top >>> 24; val v = (top & 0xFFFFFF).toInt
        if (sc.wStamp(v) == gen && d == sc.wDist(v)) {
          settled += 1
          if (d > limit) return
          val tw = targetSet.get(v)
          if (tw != null && d <= tw.intValue) {
            targetSet.remove(v); remaining -= 1 // witness found for this target
          }
          if (pos(v) >= insS && pos(v) < insE) { // expand owned nodes only
            out(v).foreach { (t, w) =>
              if (!contracted(t) && t != skip) {
                val nd = d + w
                if (nd <= limit && nd <= maxPackedDist &&
                    (sc.wStamp(t) != gen || nd < sc.wDist(t))) {
                  sc.wDist(t) = nd; sc.wStamp(t) = gen
                  sc.wPq.add(java.lang.Long.valueOf((nd << 24) | t))
                }
              }
            }
          }
        }
      }
    }

    @inline def owned(v: Int, insS: Int, insE: Int): Boolean = {
      val p = pos(v); p >= insS && p < insE
    }

    /** Contract `v` (owned by the calling task): add the needed shortcuts,
      * commit the rank, purge `v` from neighbor adjacency so later filters
      * and witness scans stay proportional to LIVE degree.
      */
    def contractNode(v: Int, insS: Int, insE: Int, sc: Scratch): Unit = {
      val ins = in(v); val outs = out(v)
      if (!ins.isEmpty && !outs.isEmpty) {
        // dense contractions (the top separator clique) skip witness pruning:
        // unpruned shortcuts are redundant, never wrong, and in a near-clique
        // witnesses rarely prune anyway — paying in-degree × settle × degree
        // there is what turned lattice builds superlinear
        val settleLimit =
          if (ins.size.toLong * outs.size > 16384) 0
          else witnessSettleLimit
        val (oTs, oWs) = outs.toArrays // v is owned: plain read
        ins.foreach { (uu, w1) =>
          // one witness search from uu covers every out-target
          val targets = new java.util.HashMap[Integer, Integer]()
          var maxW = 0L
          var k = 0
          while (k < oTs.length) {
            val x = oTs(k)
            if (x != uu) {
              val w = w1 + oWs(k)
              targets.put(x, w)
              if (w.toLong > maxW) maxW = w.toLong
            }
            k += 1
          }
          if (!targets.isEmpty) {
            if (settleLimit > 0) {
              val (sTs, sWs) =
                if (owned(uu, insS, insE)) out(uu).toArrays
                else lockOf(uu).synchronized { out(uu).toArrays }
              witness(sc, sTs, sWs, targets, v, maxW, settleLimit, insS, insE)
            }
            // targets that survive have NO witness <= via-v cost: need shortcut
            val it = targets.entrySet().iterator()
            while (it.hasNext) {
              val en = it.next()
              val x = en.getKey.intValue; val w = en.getValue.intValue
              if (owned(uu, insS, insE)) out(uu).addMin(x, w)
              else lockOf(uu).synchronized { out(uu).addMin(x, w) }
              if (owned(x, insS, insE)) in(x).addMin(uu, w)
              else lockOf(x).synchronized { in(x).addMin(uu, w) }
            }
          }
        }
      }
      contracted(v) = true
      rank(v) = orderCtr.getAndIncrement()
      in(v).foreach { (s, _) =>
        if (!contracted(s)) {
          deletedNeighbors.incrementAndGet(s)
          if (owned(s, insS, insE)) out(s).remove(v)
          else lockOf(s).synchronized { out(s).remove(v) }
        }
      }
      out(v).foreach { (t, _) =>
        if (!contracted(t)) {
          deletedNeighbors.incrementAndGet(t)
          if (owned(t, insS, insE)) in(t).remove(v)
          else lockOf(t).synchronized { in(t).remove(v) }
        }
      }
    }

    /** Contract idx[lo, hi) in edge-difference order (lazy heap). All nodes
      * in the range share a dissection level, so no depth term is needed —
      * the region recursion IS the level ordering. [insS, insE) is the
      * range the calling task owns (its whole subtree).
      */
    def contractRange(lo: Int, hi: Int, insS: Int, insE: Int): Unit = {
      if (lo >= hi) return
      val sc = scratchTl.get()
      def priorityOf(v: Int): Int = {
        val a = in(v).size; val b = out(v).size
        a * b - a - b + 2 * deletedNeighbors.get(v)
      }
      val heap = new PriorityQueue[Array[Int]](
        (a: Array[Int], b: Array[Int]) => Integer.compare(a(0), b(0)))
      var i = lo
      while (i < hi) { val v = idx(i); heap.add(Array(priorityOf(v), v)); i += 1 }
      while (!heap.isEmpty) {
        val top = heap.poll()
        val node = top(1)
        if (!contracted(node)) {
          val p = priorityOf(node)
          if (!heap.isEmpty && p > heap.peek()(0)) heap.add(Array(p, node))
          else contractNode(node, insS, insE, sc)
        }
      }
    }

    // Witness scope = the range the TASK owns (its whole subtree), not the
    // heap range being contracted: a small subtree processed inline still
    // lets leaf-level witnesses roam the full subtree, and sequential mode
    // owns the entire graph — full-quality, unrestricted witnesses.
    // Restricting witnesses to 32-node leaf ranges (first cut) found almost
    // none and inflated a 10k-lattice hierarchy to 420k shortcuts.
    val seqThreshold = 4096 // below this, recurse inline: task overhead > work
    def runSeq(r: Region, ownS: Int, ownE: Int): Unit = {
      if (r.left != null) runSeq(r.left, ownS, ownE)
      if (r.right != null) runSeq(r.right, ownS, ownE)
      contractRange(r.sepStart, r.e, ownS, ownE)
    }
    final class RegionTask(r: Region) extends java.util.concurrent.RecursiveAction {
      override def compute(): Unit = {
        if (r.e - r.s <= seqThreshold) runSeq(r, r.s, r.e)
        else {
          if (r.left != null && r.right != null)
            java.util.concurrent.ForkJoinTask.invokeAll(
              new RegionTask(r.left), new RegionTask(r.right))
          else if (r.left != null) new RegionTask(r.left).compute()
          else if (r.right != null) new RegionTask(r.right).compute()
          contractRange(r.sepStart, r.e, r.s, r.e)
        }
      }
    }
    val par =
      if (parallelism > 0) parallelism
      else math.max(1, math.min(Runtime.getRuntime.availableProcessors, 32))
    if (par == 1 || n <= seqThreshold) runSeq(root, 0, n)
    else {
      val pool = new java.util.concurrent.ForkJoinPool(par)
      try pool.invoke(new RegionTask(root))
      finally pool.shutdown()
    }

    // split augmented adjacency into upward / downward-reverse CSRs;
    // buffers are min-merged by construction, so no dedup pass is needed
    def toCsr(bufs: Array[NB], pred: (Int, Int) => Boolean)
        : (Array[Int], Array[Int], Array[Int]) = {
      val off = new Array[Int](n + 1)
      var i = 0
      while (i < n) {
        var c = 0
        bufs(i).foreach((t, _) => if (pred(i, t)) c += 1)
        off(i + 1) = off(i) + c
        i += 1
      }
      val tgt = new Array[Int](off(n)); val w = new Array[Int](off(n))
      i = 0
      while (i < n) {
        var p = off(i)
        bufs(i).foreach { (t, ww) =>
          if (pred(i, t)) { tgt(p) = t; w(p) = ww; p += 1 }
        }
        i += 1
      }
      (off, tgt, w)
    }
    val (uo, ut, uw) = toCsr(out, (i, t) => rank(t) > rank(i))
    val (dno, dnt, dnw) = toCsr(in, (i, s) => rank(s) > rank(i))
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

  /** Exact set-to-set minimum: min over (s, t) of
    * `srcOff(s) + dist(src(s), dst(t)) + dstOff(t)`.
    *
    * Both sides run as MULTI-SOURCE upward searches — the forward search
    * seeds every source at its offset, so `distF(u)` is the cheapest
    * source-side reach of `u`, and symmetrically for targets. Every
    * shortest path in the base graph is an up-down path in the CH, so the
    * best meeting node over the two searches is exact — this is the
    * many-to-many CH primitive (one bucket per meeting node collapsed to
    * its min, Knopp et al. 2007) specialised to a single joint minimum,
    * which is all the tiled-overlay stitch needs (legs from the source
    * tile's boundary meet legs into the target tile's boundary).
    *
    * Offsets must be non-negative. Returns Long.MaxValue when no pair
    * connects (caller maps to its own unreachable sentinel).
    */
  def shortestSetJoinMs(srcIdx: Array[Int], srcOff: Array[Long],
                        dstIdx: Array[Int], dstOff: Array[Long]): Long = {
    gen += 1
    pqF.clear(); pqB.clear()
    var i = 0
    while (i < srcIdx.length) {
      val s = srcIdx(i); val d = srcOff(i)
      if (stampF(s) != gen || d < distF(s)) {
        distF(s) = d; stampF(s) = gen; pqF.add(new QE(s, d))
      }
      i += 1
    }
    i = 0
    while (i < dstIdx.length) {
      val t = dstIdx(i); val d = dstOff(i)
      if (stampB(t) != gen || d < distB(t)) {
        distB(t) = d; stampB(t) = gen; pqB.add(new QE(t, d))
      }
      i += 1
    }
    var best = Long.MaxValue
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
    best
  }
}

object ChQuery {
  // executor-side reuse: mapGroups processes many groups per task thread;
  // per-group allocation of the O(n) scratch arrays would dominate, so one
  // query object is kept per (thread, ChGraph) pair
  private val tl = new ThreadLocal[(ChGraph, ChQuery)]
  def forGraph(ch: ChGraph): ChQuery = {
    val cur = tl.get()
    if (cur != null && (cur._1 eq ch)) cur._2
    else { val q = new ChQuery(ch); tl.set((ch, q)); q }
  }
}
