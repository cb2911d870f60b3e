package graft.algo

import graft.graph.{GridIndex, PreparedGraph}
import org.apache.spark.sql.SparkSession
import java.util.PriorityQueue

/** Cluster-distributed contraction-hierarchy preparation.
  *
  * [[ContractionHierarchy.build]] parallelizes across driver cores; an
  * Italy-class graph (9.7M nodes, ITALY.md:55-56 in the reference) still
  * takes driver-bound tens of minutes. This module moves the heavy phase to
  * executors with the same one-sided-separator argument the driver build
  * uses, but at cluster granularity:
  *
  *  1. **Tile** the nodes geometrically (as [[graft.graph.Tiled]] does).
  *     Boundary nodes are the endpoints of cross-tile edges; interior nodes
  *     of two DIFFERENT tiles are never adjacent (such an edge would make
  *     both endpoints boundary), so per-tile interior contractions commute —
  *     any interleaving of the tile-local orders is a valid global
  *     contraction order.
  *  2. **Contract interiors in executors** — one task per tile, each seeing
  *     only its tile's subgraph (broadcast graph, local extraction). Witness
  *     searches are scoped to the tile: a missed cross-tile witness can only
  *     ADD a redundant shortcut, never skip a required one, so exactness is
  *     unaffected (the same conservativeness argument as the driver build's
  *     owned-subtree scope).
  *  3. **Contract the boundary remainder on the driver** with the existing
  *     parallel build. After all interiors are contracted the live graph is
  *     exactly: boundary nodes + original boundary-boundary edges + the
  *     boundary-boundary shortcuts the tiles emitted — contraction preserves
  *     pairwise distances among live nodes, so this remainder is
  *     distance-true and the standard build applies.
  *  4. **Assemble**: global rank = tile interiors first (per-tile contiguous
  *     blocks — cross-tile interior pairs share no edge, so their relative
  *     order is immaterial), boundary above all interiors in remainder-rank
  *     order. Augmented edge set = original edges ∪ tile shortcuts ∪
  *     remainder shortcuts, min-deduped per (src, dst), split into
  *     upward / downward-reverse CSR by rank. Queries use the unmodified
  *     [[ChQuery]].
  *
  * At 100 TB scale the executors do O(n) contraction work in parallel while
  * the driver handles only the O(n/√tileArea) boundary — the same shape as
  * the tiled-overlay router, applied to preprocessing instead of queries.
  */
object DistributedCh {

  /** Per-tile result: contraction order of interior nodes (global ids, in
    * contraction order) and emitted shortcuts (global ids, ms weights).
    */
  private final case class TilePart(order: Array[Int], shortcuts: Array[Array[Int]])

  def build(spark: SparkSession, g: PreparedGraph, cells: Int,
            witnessSettleLimit: Int = 800): ChGraph = {
    val n = g.numNodes
    require(cells >= 1)

    // geometric tile of every node (grid over the bounding box)
    var minLat = Double.MaxValue; var maxLat = -Double.MaxValue
    var minLon = Double.MaxValue; var maxLon = -Double.MaxValue
    var i = 0
    while (i < n) {
      val la = g.nodeLat(i); val lo = g.nodeLon(i)
      if (la < minLat) minLat = la; if (la > maxLat) maxLat = la
      if (lo < minLon) minLon = lo; if (lo > maxLon) maxLon = lo
      i += 1
    }
    val cellLat = math.max(1e-9, (maxLat - minLat) / cells)
    val cellLon = math.max(1e-9, (maxLon - minLon) / cells)
    val tileOf = new Array[Int](n)
    i = 0
    while (i < n) {
      val ti = math.min(cells - 1, math.max(0, ((g.nodeLat(i) - minLat) / cellLat).toInt))
      val tj = math.min(cells - 1, math.max(0, ((g.nodeLon(i) - minLon) / cellLon).toInt))
      tileOf(i) = ti * cells + tj
      i += 1
    }

    // boundary = endpoints of cross-tile edges
    val isBoundary = new Array[Boolean](n)
    var u = 0
    while (u < n) {
      var e = g.offsets(u)
      while (e < g.offsets(u + 1)) {
        val v = g.targets(e)
        if (tileOf(u) != tileOf(v)) { isBoundary(u) = true; isBoundary(v) = true }
        e += 1
      }
      u += 1
    }

    // executor phase: contract each tile's interior
    val bcG = spark.sparkContext.broadcast(g)
    val bcTile = spark.sparkContext.broadcast(tileOf)
    val bcBound = spark.sparkContext.broadcast(isBoundary)
    val present = new Array[Boolean](cells * cells)
    i = 0
    while (i < n) { present(tileOf(i)) = true; i += 1 }
    val tiles = (0 until cells * cells).filter(present)
    val parts = spark.sparkContext
      .parallelize(tiles, math.max(1, tiles.size))
      .map { t =>
        t -> contractTileInterior(bcG.value, bcTile.value, bcBound.value, t,
          witnessSettleLimit)
      }
      .collect()
      .toMap

    // global interior ranks: contiguous block per tile, in tile-id order
    val rank = new Array[Int](n)
    var next = 0
    tiles.foreach { t =>
      parts(t).order.foreach { v => rank(v) = next; next += 1 }
    }
    val numInterior = next

    // driver phase: remainder graph over boundary nodes
    val bIds = (0 until n).filter(isBoundary).toArray
    val bIdx = new java.util.HashMap[Integer, Integer](bIds.length * 2)
    i = 0
    while (i < bIds.length) { bIdx.put(bIds(i), i); i += 1 }
    // remainder edges: original boundary-boundary + tile shortcuts whose
    // endpoints are both boundary, min-deduped
    val remEdges = new java.util.HashMap[java.lang.Long, Integer]()
    def addRem(s: Int, d: Int, w: Int): Unit = {
      val si = bIdx.get(s); val di = bIdx.get(d)
      if (si != null && di != null && s != d) {
        val key = java.lang.Long.valueOf((si.intValue.toLong << 32) | (di.intValue.toLong & 0xffffffffL))
        val prev = remEdges.get(key)
        if (prev == null || w < prev.intValue) remEdges.put(key, w)
      }
    }
    u = 0
    while (u < n) {
      if (isBoundary(u)) {
        var e = g.offsets(u)
        while (e < g.offsets(u + 1)) { addRem(u, g.targets(e), g.weightsMs(e)); e += 1 }
      }
      u += 1
    }
    parts.valuesIterator.foreach(_.shortcuts.foreach { sc => addRem(sc(0), sc(1), sc(2)) })

    val remCh: ChGraph =
      if (bIds.isEmpty) null
      else {
        val nb = bIds.length
        val m = remEdges.size
        val srcs = new Array[Int](m); val dsts = new Array[Int](m); val ws = new Array[Int](m)
        var k = 0
        val it = remEdges.entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          srcs(k) = (en.getKey.longValue >>> 32).toInt
          dsts(k) = en.getKey.longValue.toInt
          ws(k) = en.getValue.intValue
          k += 1
        }
        def csr(ss: Array[Int], dd: Array[Int]): (Array[Int], Array[Int], Array[Int]) = {
          val off = new Array[Int](nb + 1)
          var e = 0
          while (e < m) { off(ss(e) + 1) += 1; e += 1 }
          var j = 0
          while (j < nb) { off(j + 1) += off(j); j += 1 }
          val tg = new Array[Int](m); val ww = new Array[Int](m)
          val cur = off.clone()
          e = 0
          while (e < m) {
            val p = cur(ss(e)); cur(ss(e)) += 1
            tg(p) = dd(e); ww(p) = ws(e)
            e += 1
          }
          (off, tg, ww)
        }
        val (fo, ft, fw) = csr(srcs, dsts)
        val (ro, rt, rw) = csr(dsts, srcs)
        val bLat = bIds.map(g.nodeLat); val bLon = bIds.map(g.nodeLon)
        val pg = new PreparedGraph(bLat, bLon, fo, ft, fw,
          new Array[Float](m), ro, rt, rw,
          GridIndex.build(Array.range(0, nb), bLat, bLon))
        ContractionHierarchy.build(pg, witnessSettleLimit)
      }
    if (remCh != null) {
      i = 0
      while (i < bIds.length) { rank(bIds(i)) = numInterior + remCh.rank(i); i += 1 }
    }

    // assembly: augmented edge set, min-deduped per (src, dst) global pair
    val aug = new java.util.HashMap[java.lang.Long, Integer](g.numEdges * 3)
    def addAug(s: Int, d: Int, w: Int): Unit = {
      if (s != d) {
        val key = java.lang.Long.valueOf((s.toLong << 32) | (d.toLong & 0xffffffffL))
        val prev = aug.get(key)
        if (prev == null || w < prev.intValue) aug.put(key, w)
      }
    }
    u = 0
    while (u < n) {
      var e = g.offsets(u)
      while (e < g.offsets(u + 1)) { addAug(u, g.targets(e), g.weightsMs(e)); e += 1 }
      u += 1
    }
    parts.valuesIterator.foreach(_.shortcuts.foreach { sc => addAug(sc(0), sc(1), sc(2)) })
    if (remCh != null) {
      // remainder augmented edges (original + its shortcuts) read back from
      // the remainder CH's own up/dn arrays
      var b = 0
      while (b < bIds.length) {
        var e = remCh.upOff(b)
        while (e < remCh.upOff(b + 1)) {
          addAug(bIds(b), bIds(remCh.upTgt(e)), remCh.upW(e)); e += 1
        }
        e = remCh.dnOff(b)
        while (e < remCh.dnOff(b + 1)) {
          addAug(bIds(remCh.dnTgt(e)), bIds(b), remCh.dnW(e)); e += 1
        }
        b += 1
      }
    }

    // split by rank into upward / downward-reverse CSR
    val upCnt = new Array[Int](n + 1); val dnCnt = new Array[Int](n + 1)
    val it2 = aug.entrySet().iterator()
    while (it2.hasNext) {
      val en = it2.next()
      val s = (en.getKey.longValue >>> 32).toInt; val d = en.getKey.longValue.toInt
      if (rank(d) > rank(s)) upCnt(s + 1) += 1 else dnCnt(d + 1) += 1
    }
    i = 0
    while (i < n) { upCnt(i + 1) += upCnt(i); dnCnt(i + 1) += dnCnt(i); i += 1 }
    val upTgt = new Array[Int](upCnt(n)); val upW = new Array[Int](upCnt(n))
    val dnTgt = new Array[Int](dnCnt(n)); val dnW = new Array[Int](dnCnt(n))
    val upCur = upCnt.clone(); val dnCur = dnCnt.clone()
    val it3 = aug.entrySet().iterator()
    while (it3.hasNext) {
      val en = it3.next()
      val s = (en.getKey.longValue >>> 32).toInt; val d = en.getKey.longValue.toInt
      val w = en.getValue.intValue
      if (rank(d) > rank(s)) {
        val p = upCur(s); upCur(s) += 1; upTgt(p) = d; upW(p) = w
      } else {
        val p = dnCur(d); dnCur(d) += 1; dnTgt(p) = s; dnW(p) = w
      }
    }
    new ChGraph(n, rank, upCnt, upTgt, upW, dnCnt, dnTgt, dnW)
  }

  /** Sequential contraction of one tile's interior nodes over its local
    * subgraph. Classic lazy-priority contraction: priority = edge difference
    * + deleted-neighbor count, re-evaluated on pop; witness searches are
    * bounded Dijkstras over live local nodes.
    */
  private def contractTileInterior(g: PreparedGraph, tileOf: Array[Int],
                                   isBoundary: Array[Boolean], tile: Int,
                                   witnessSettleLimit: Int): TilePart = {
    // local node universe: every node of this tile
    val locals = new scala.collection.mutable.ArrayBuffer[Int]()
    var v = 0
    while (v < tileOf.length) { if (tileOf(v) == tile) locals += v; v += 1 }
    val nl = locals.length
    val l2g = locals.toArray
    val g2l = new java.util.HashMap[Integer, Integer](nl * 2)
    var i = 0
    while (i < nl) { g2l.put(l2g(i), i); i += 1 }

    // local adjacency as min-merged hash maps (out and in), local indices;
    // only same-tile edges — cross edges never participate in interior
    // contraction (both their endpoints are boundary)
    val out = Array.fill(nl)(new java.util.HashMap[Integer, Integer]())
    val in = Array.fill(nl)(new java.util.HashMap[Integer, Integer]())
    def addEdge(a: Int, b: Int, w: Int): Unit = {
      if (a != b) {
        val po = out(a).get(b)
        if (po == null || w < po.intValue) out(a).put(b, w)
        val pi = in(b).get(a)
        if (pi == null || w < pi.intValue) in(b).put(a, w)
      }
    }
    i = 0
    while (i < nl) {
      val gu = l2g(i)
      var e = g.offsets(gu)
      while (e < g.offsets(gu + 1)) {
        val gv = g.targets(e)
        val lv = g2l.get(gv)
        if (lv != null) addEdge(i, lv.intValue, g.weightsMs(e))
        e += 1
      }
      i += 1
    }

    val contracted = new Array[Boolean](nl)
    val deleted = new Array[Int](nl)

    // bounded witness Dijkstra from src avoiding `skip`: returns distances
    // to targets implicitly via the dist map
    val wDist = new java.util.HashMap[Integer, java.lang.Long]()
    def witnessPrune(src: Int, skip: Int, cap: Long,
                     targets: java.util.HashMap[Integer, Integer]): java.util.HashSet[Integer] = {
      // returns the subset of target nodes REACHED within cap (witnessed)
      val reached = new java.util.HashSet[Integer]()
      wDist.clear()
      val pq = new PriorityQueue[Array[Long]]((a, b) => java.lang.Long.compare(a(0), b(0)))
      wDist.put(src, 0L)
      pq.add(Array(0L, src.toLong))
      var settled = 0
      var remaining = targets.size
      while (!pq.isEmpty && settled < witnessSettleLimit && remaining > 0) {
        val top = pq.poll()
        val d = top(0); val x = top(1).toInt
        val cur = wDist.get(x)
        if (cur != null && cur.longValue == d) {
          settled += 1
          val tw = targets.get(x)
          if (tw != null && d <= tw.longValue && !reached.contains(x)) {
            reached.add(x); remaining -= 1
          }
          if (d < cap) {
            val it = out(x).entrySet().iterator()
            while (it.hasNext) {
              val en = it.next()
              val y = en.getKey.intValue
              if (y != skip && !contracted(y)) {
                val nd = d + en.getValue.intValue
                if (nd <= cap) {
                  val pd = wDist.get(y)
                  if (pd == null || nd < pd.longValue) {
                    wDist.put(y, nd)
                    pq.add(Array(nd, y.toLong))
                  }
                }
              }
            }
          }
        }
      }
      reached
    }

    // shortcuts this node would need right now (u -> x pairs with weights)
    def simulate(lv: Int): Array[Array[Int]] = {
      val res = new scala.collection.mutable.ArrayBuffer[Array[Int]]()
      val ins = in(lv).entrySet().iterator()
      while (ins.hasNext) {
        val ien = ins.next()
        val lu = ien.getKey.intValue
        if (!contracted(lu)) {
          val win = ien.getValue.intValue
          // candidate targets through lv with via costs
          val tgts = new java.util.HashMap[Integer, Integer]()
          var maxVia = 0L
          val outs = out(lv).entrySet().iterator()
          while (outs.hasNext) {
            val oen = outs.next()
            val lx = oen.getKey.intValue
            if (!contracted(lx) && lx != lu) {
              val via = win + oen.getValue.intValue
              // a witness at most equal to the via cost suppresses the
              // shortcut (ties resolved toward no-shortcut, like the
              // driver build)
              tgts.put(lx, via)
              if (via > maxVia) maxVia = via
            }
          }
          if (!tgts.isEmpty) {
            val witnessed = witnessPrune(lu, lv, maxVia, tgts)
            val t2 = tgts.entrySet().iterator()
            while (t2.hasNext) {
              val en = t2.next()
              if (!witnessed.contains(en.getKey))
                res += Array(lu, en.getKey.intValue, en.getValue.intValue)
            }
          }
        }
      }
      res.toArray
    }

    // lazy priority queue over interior nodes
    def priorityOf(lv: Int, scCount: Int): Int = {
      var live = 0
      val it = out(lv).keySet().iterator()
      while (it.hasNext) { if (!contracted(it.next().intValue)) live += 1 }
      val it2 = in(lv).keySet().iterator()
      while (it2.hasNext) { if (!contracted(it2.next().intValue)) live += 1 }
      scCount - live + deleted(lv)
    }

    val order = new scala.collection.mutable.ArrayBuffer[Int]()
    val shortcuts = new scala.collection.mutable.ArrayBuffer[Array[Int]]()
    val pq = new PriorityQueue[Array[Int]]((a, b) => Integer.compare(a(0), b(0)))
    i = 0
    while (i < nl) {
      if (!isBoundary(l2g(i))) {
        val sim = simulate(i)
        pq.add(Array(priorityOf(i, sim.length), i))
      }
      i += 1
    }
    while (!pq.isEmpty) {
      val top = pq.poll()
      val lv = top(1)
      if (!contracted(lv)) {
        val sim = simulate(lv)
        val p = priorityOf(lv, sim.length)
        if (!pq.isEmpty && p > pq.peek()(0)) {
          pq.add(Array(p, lv)) // stale priority — re-queue
        } else {
          // contract: add shortcuts, mark neighbors
          sim.foreach { sc =>
            addEdge(sc(0), sc(1), sc(2))
            shortcuts += Array(l2g(sc(0)), l2g(sc(1)), sc(2))
          }
          contracted(lv) = true
          val it = out(lv).keySet().iterator()
          while (it.hasNext) {
            val y = it.next().intValue
            if (!contracted(y)) deleted(y) += 1
          }
          val it2 = in(lv).keySet().iterator()
          while (it2.hasNext) {
            val y = it2.next().intValue
            if (!contracted(y)) deleted(y) += 1
          }
          order += l2g(lv)
        }
      }
    }
    TilePart(order.toArray, shortcuts.toArray)
  }
}
