package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tile-partitioned routing — the beyond-broadcast scale path (SURVEY §9.2,
  * mirroring Valhalla's own tile design,
  * reference: src/valhalla_build_tiles_simple.cpp:82-83).
  *
  * A planet-class road graph (~300M edges ≈ 9 GB CSR) exceeds a sane
  * broadcast. This module partitions the graph into geographic tiles:
  *
  *  - **Build** (distributed): nodes get a geometric tile id; interior
  *    edges (both endpoints in one tile) are written as parquet PARTITIONED
  *    BY tile; for every tile, the exact shortest-path distance between each
  *    ordered pair of its boundary nodes is computed inside executors
  *    (cogroup per tile → local Dijkstra per boundary node — the heavy,
  *    embarrassingly parallel step).
  *  - **Overlay** (driver/broadcast-sized): boundary nodes + cross-tile
  *    edges + the per-tile boundary-pair distances. This is the "transit
  *    level" of a hierarchical router — orders of magnitude smaller than
  *    the full graph (O(n/√tileArea) nodes for planar-ish road networks).
  *  - **Query** (exact): forward Dijkstra inside the source tile, backward
  *    Dijkstra inside the target tile, multi-source Dijkstra over the
  *    overlay between the two boundary sets. Any shortest path decomposes
  *    into maximal within-tile segments (whose endpoints are boundary
  *    nodes) joined by cross-tile edges, and every such segment is an
  *    overlay edge with the exact within-tile distance — so the stitched
  *    distance equals the flat-graph distance (TiledSpec proves equality
  *    against plain Dijkstra).
  *
  * Tiles load on demand through partition-pruned parquet reads with a small
  * LRU cache: the driver never holds more than `cacheTiles` tile subgraphs
  * plus the overlay. Batch OD workloads co-partition by (srcTile, dstTile)
  * with the same primitives (SURVEY §9.2 step 3); the point-query API here
  * is the exactness witness.
  */
object Tiled {

  /** One tile's interior subgraph, local-index CSR keyed by global node id. */
  final class TileLocal(
      val ids: Array[Long],
      val lat: Array[Double], val lon: Array[Double],
      val off: Array[Int], val tgt: Array[Int], val w: Array[Int],
      val rOff: Array[Int], val rTgt: Array[Int], val rW: Array[Int]) {
    val index: java.util.HashMap[Long, Integer] = {
      val m = new java.util.HashMap[Long, Integer](ids.length * 2)
      var i = 0
      while (i < ids.length) { m.put(ids(i), i); i += 1 }
      m
    }

    /** Single-source distances over the interior (forward or reverse).
      * Heap is the allocation-free primitive [[graft.algo.LongMinHeap]]:
      * the boxed PriorityQueue[Array[Long]] allocated one 2-long array per
      * edge relaxation — measured as 469 s of GC in 1005 s of task time on
      * the r24 tile-legs stage (guide §1.2 step 2).
      */
    def distancesFrom(srcLocal: Int, reverse: Boolean): Array[Long] = {
      val n = ids.length
      val (o, t, ww) = if (reverse) (rOff, rTgt, rW) else (off, tgt, w)
      val dist = Array.fill(n)(Long.MaxValue)
      val pq = new graft.algo.LongMinHeap(256)
      dist(srcLocal) = 0L
      pq.add(0L, srcLocal)
      while (!pq.isEmpty) {
        val d = pq.topDist; val v = pq.topNode
        pq.removeTop()
        if (d == dist(v)) {
          var e = o(v)
          while (e < o(v + 1)) {
            val nd = d + ww(e)
            if (nd < dist(t(e))) { dist(t(e)) = nd; pq.add(nd, t(e)) }
            e += 1
          }
        }
      }
      dist
    }

    /** Like [[distancesFrom]] but also returns the parent (predecessor in
      * the search tree, -1 at the source/unreached) of every node — the
      * geometry-reconstruction form.
      */
    def distancesWithParents(srcLocal: Int, reverse: Boolean): (Array[Long], Array[Int]) = {
      val n = ids.length
      val (o, t, ww) = if (reverse) (rOff, rTgt, rW) else (off, tgt, w)
      val dist = Array.fill(n)(Long.MaxValue)
      val par = Array.fill(n)(-1)
      val pq = new graft.algo.LongMinHeap(256)
      dist(srcLocal) = 0L
      pq.add(0L, srcLocal)
      while (!pq.isEmpty) {
        val d = pq.topDist; val v = pq.topNode
        pq.removeTop()
        if (d == dist(v)) {
          var e = o(v)
          while (e < o(v + 1)) {
            val nd = d + ww(e)
            if (nd < dist(t(e))) {
              dist(t(e)) = nd; par(t(e)) = v
              pq.add(nd, t(e))
            }
            e += 1
          }
        }
      }
      (dist, par)
    }

    /** Nearest node to (lat, lon) by equirectangular scan (tile-sized). */
    def nearest(qLat: Double, qLon: Double): Int = {
      var best = -1; var bestD = Double.MaxValue
      var i = 0
      while (i < ids.length) {
        // dLat² lower bound skips the cos for latitude-far nodes
        // (d >= dLat² and improvement needs strict <, so skipping
        // dLat² >= bestD is exact)
        val dLat = lat(i) - qLat
        if (dLat * dLat < bestD) {
          val d = graft.geo.Geo.approxDist2(qLat, qLon, lat(i), lon(i))
          if (d < bestD) { bestD = d; best = i }
        }
        i += 1
      }
      best
    }
  }

  private[graph] def buildLocal(ids: Array[Long], lats: Array[Double], lons: Array[Double],
                                es: EdgeCols): TileLocal = {
    val n = ids.length
    val index = new graft.algo.LongIntHashMap(n)
    var i = 0
    while (i < n) { index.put(ids(i), i); i += 1 }
    val m = es.n
    val srcs = new Array[Int](m); val dsts = new Array[Int](m); val ws = new Array[Int](m)
    var k = 0
    var e0 = 0
    while (e0 < m) {
      val si = index.get(es.src(e0)); val di = index.get(es.dst(e0))
      if (si >= 0 && di >= 0) {
        srcs(k) = si; dsts(k) = di
        ws(k) = math.min(es.w(e0), Int.MaxValue).toInt
        k += 1
      }
      e0 += 1
    }
    def csr(ss: Array[Int], dd: Array[Int]): (Array[Int], Array[Int], Array[Int]) = {
      val off = new Array[Int](n + 1)
      var e = 0
      while (e < k) { off(ss(e) + 1) += 1; e += 1 }
      var j = 0
      while (j < n) { off(j + 1) += off(j); j += 1 }
      val tgt = new Array[Int](k); val w = new Array[Int](k)
      val cur = off.clone()
      e = 0
      while (e < k) {
        val p = cur(ss(e)); cur(ss(e)) += 1
        tgt(p) = dd(e); w(p) = ws(e)
        e += 1
      }
      (off, tgt, w)
    }
    val (o, t, w) = csr(srcs, dsts)
    val (ro, rt, rw) = csr(dsts, srcs)
    new TileLocal(ids, lats, lons, o, t, w, ro, rt, rw)
  }

  /** Build the tile layout + overlay. Writes `outDir/nodes` and
    * `outDir/interior` parquet partitioned by tile; returns the router.
    * `cells` is the tiles-per-axis of the geometric grid.
    *
    * nodes: (id BIGINT, lat DOUBLE, lon DOUBLE); edges: directed
    * (src BIGINT, dst BIGINT, time_ms BIGINT).
    */
  def build(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
            cells: Int, outDir: String, chGate: Int = 100000): TiledRouter = {
    import spark.implicits._
    val Seq(minLat, maxLat, minLon, maxLon) =
      nodes.agg(min($"lat"), max($"lat"), min($"lon"), max($"lon"))
        .collect().head.toSeq.map(_.asInstanceOf[Double])
    val grid = TileGrid(minLat, minLon,
      math.max(1e-9, (maxLat - minLat) / cells), math.max(1e-9, (maxLon - minLon) / cells),
      cells)
    // invalidate any previous sidecar BEFORE touching the parquet layout: a
    // rebuild that crashes after the parquet writes but before the sidecar
    // rewrite must leave load() on the (fresh, correct) parquet path, never
    // on a stale overlay.bin that silently wins over it
    val outFs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    outFs.delete(new org.apache.hadoop.fs.Path(s"$outDir/overlay.bin"), false): Unit
    outFs.delete(new org.apache.hadoop.fs.Path(s"$outDir/overlay.stamp"), false): Unit

    def tileExpr(latC: org.apache.spark.sql.Column, lonC: org.apache.spark.sql.Column) = {
      val ti = least(lit(cells - 1), greatest(lit(0),
        floor((latC - lit(grid.minLat)) / lit(grid.cellLat)).cast("int")))
      val tj = least(lit(cells - 1), greatest(lit(0),
        floor((lonC - lit(grid.minLon)) / lit(grid.cellLon)).cast("int")))
      ti * cells + tj
    }

    val nodesT = nodes.select($"id".cast("long").as("id"), $"lat".cast("double").as("lat"),
      $"lon".cast("double").as("lon"), tileExpr($"lat", $"lon").as("tile"))
    // repartition by tile first: ONE file per tile dir (instead of one per
    // shuffle partition), so every partition-pruned tile read opens a
    // single file and a tile's rows can never split across scan partitions
    nodesT.repartition(col("tile"))
      .write.mode("overwrite").partitionBy("tile").parquet(s"$outDir/nodes")
    val nt = spark.read.parquet(s"$outDir/nodes")

    // Tag both endpoints with their tile. This double join over the full
    // edge set is the build's widest shuffle — persist it: FOUR consumers
    // follow (interior write, cross edges, both boundary projections), and
    // without the cache each would re-run the joins end-to-end (measured
    // 4x on the 9.7M-node witness). The cross-tile subset is a second,
    // tiny cache (arterial-thinned: ~1e-3 of edges) serving three readers.
    val eT = edges.select($"src".cast("long").as("src"), $"dst".cast("long").as("dst"),
        $"time_ms".cast("long").as("time_ms"))
      .join(nt.select($"id".as("src"), $"tile".as("src_tile")), "src")
      .join(nt.select($"id".as("dst"), $"tile".as("dst_tile")), "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val interior = eT.filter($"src_tile" === $"dst_tile")
      .select($"src", $"dst", $"time_ms", $"src_tile".as("tile"))
    interior.repartition(col("tile"))
      .write.mode("overwrite").partitionBy("tile").parquet(s"$outDir/interior")

    val crossT = eT.filter($"src_tile" =!= $"dst_tile")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cross = crossT.select($"src", $"dst", $"time_ms").as[(Long, Long, Long)]

    // boundary nodes: endpoints of cross-tile edges, tagged with THEIR tile
    val boundary = crossT
      .select($"src".as("id"), $"src_tile".as("tile"))
      .unionByName(crossT.select($"dst".as("id"), $"dst_tile".as("tile")))
      .distinct()

    // distributed overlay construction: per tile, exact boundary-pair
    // distances over the interior subgraph (one Dijkstra per boundary node,
    // all inside executors — the build's heavy step)
    val interiorByTile = spark.read.parquet(s"$outDir/interior")
      .select($"tile".cast("int"), $"src", $"dst", $"time_ms")
      .as[(Int, Long, Long, Long)].groupByKey(_._1)
    val boundaryByTile = boundary.select($"tile".cast("int"), $"id")
      .as[(Int, Long)].groupByKey(_._1)
    val intra = interiorByTile.cogroup(boundaryByTile) { (_, eIt, bIt) =>
      val es = EdgeCols.fromIterator(eIt.map(e => (e._2, e._3, e._4)))
      val bs = bIt.map(_._2).toArray
      if (bs.length < 2) Iterator.empty
      else {
        // node universe: every id seen in this tile's interior or boundary
        val seen = new graft.algo.LongIntHashMap(es.n / 2 + bs.length + 16)
        val idBuf = new graft.algo.LongBuf(es.n / 2 + 16)
        def addId(x: Long): Unit =
          if (seen.get(x) < 0) { seen.put(x, 0); idBuf.add(x) }
        bs.foreach(addId)
        var ei = 0
        while (ei < es.n) { addId(es.src(ei)); addId(es.dst(ei)); ei += 1 }
        val ids = java.util.Arrays.copyOf(idBuf.raw, idBuf.size)
        val local = buildLocal(ids, new Array[Double](ids.length),
          new Array[Double](ids.length), es)
        bs.iterator.flatMap { b =>
          val bi = local.index.get(b)
          if (bi == null) Iterator.empty
          else {
            val dist = local.distancesFrom(bi.intValue, reverse = false)
            bs.iterator.filter(_ != b).flatMap { b2 =>
              val b2i = local.index.get(b2)
              if (b2i == null || dist(b2i.intValue) == Long.MaxValue) Iterator.empty
              else Iterator.single((b, b2, dist(b2i.intValue)))
            }
          }
        }
      }
    }

    // overlay = cross-tile edges + within-tile boundary-pair distances
    val overlayEdges = cross.union(intra).collect()
    val boundaryRows = boundary.join(nt.select($"id", $"lat", $"lon"), "id")
      .select($"id".cast("long"), $"tile".cast("int"),
        $"lat".cast("double"), $"lon".cast("double"))
      .as[(Long, Int, Double, Double)].collect()
    eT.unpersist(); crossT.unpersist()
    val bIndex = new java.util.HashMap[Long, Integer](boundaryRows.length * 2)
    val bIds = new Array[Long](boundaryRows.length)
    val bTiles = new Array[Int](boundaryRows.length)
    val bLat = new Array[Double](boundaryRows.length)
    val bLon = new Array[Double](boundaryRows.length)
    var i = 0
    boundaryRows.foreach { case (id, tile, la, lo) =>
      bIndex.put(id, i); bIds(i) = id; bTiles(i) = tile
      bLat(i) = la; bLon(i) = lo; i += 1
    }
    val nb = bIds.length
    // canonical SORTED local-index triples: the CSR layout becomes
    // deterministic, so the persisted CH's fingerprint survives a reload
    // (parquet row order is not stable across reads)
    val triples = overlayEdges.flatMap { case (s, d, t) =>
      val si = bIndex.get(s); val di = bIndex.get(d)
      if (si == null || di == null || si.intValue == di.intValue) None
      else Some((si.intValue, di.intValue, math.min(t, Int.MaxValue).toInt))
    }.sorted
    val (off, tgt, w) = overlayCsr(nb, triples)
    val ov = new Overlay(bIds, bTiles, bIndex, off, tgt, w, bLat, bLon)
    // contraction hierarchy over the overlay: the long-range stitch then
    // costs a few hundred settled nodes per query instead of a Dijkstra
    // over the whole transit level (millions of nodes at planet scale)
    if (nb >= 2 && nb <= chGate) ov.ch = buildOverlayCh(ov, bLat, bLon)

    // persist overlay + grid beside the tile parquet: the boundary
    // Dijkstras and the CH build are paid once; Tiled.load rehydrates
    (0 until nb).map(j => (j, bIds(j), bTiles(j), bLat(j), bLon(j)))
      .toDF("idx", "id", "tile", "lat", "lon")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/overlay_nodes")
    triples.toSeq.toDF("src", "dst", "time_ms")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/overlay_edges")
    Seq((grid.minLat, grid.minLon, grid.cellLat, grid.cellLon, grid.cells))
      .toDF("min_lat", "min_lon", "cell_lat", "cell_lon", "cells")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/grid")
    // the stamp belongs to the parquet phase: load() cross-checks the
    // sidecar's embedded fingerprint against it, so a sidecar from any
    // OTHER build generation can never win over this parquet layout
    saveOverlayStamp(outFs, outDir,
      overlayFingerprint(grid, bIds, bTiles, bLat, bLon, triples))
    if (ov.ch != null) {
      ChStore.saveStream(
        outFs.create(new org.apache.hadoop.fs.Path(s"$outDir/overlay_ch.bin"), true),
        ChStore.fingerprintCsr(off, tgt, w, nb, tgt.length), ov.ch)
    }
    saveOverlayBin(outFs, s"$outDir/overlay.bin", grid,
      bIds, bTiles, bLat, bLon, triples)
    new TiledRouter(spark, outDir, grid, ov)
  }

  /** Flat-binary overlay sidecar (`overlay.bin`): grid + boundary nodes +
    * sorted overlay triples in one stream. Parquet stays the canonical,
    * engine-readable layout; the sidecar exists because three session-warm
    * DataFrame reads of tiny files still pay plan/codegen/job overhead that
    * dominates first-query latency (ITALY.md:374's 2-3 s tile-load budget —
    * the sidecar reads in tens of ms like `overlay_ch.bin`). Written at
    * build time; [[load]] self-heals pre-sidecar layouts by writing it
    * after a parquet-path rehydration.
    */
  private final val OverlayBinMagic = 0x47524f56 // "GROV"
  private final val OverlayBinVersion = 1
  // the count bounds a sidecar is allowed to carry — SHARED by save and
  // load: an oversized overlay is never written (the parquet path is the
  // contract there), so load can't loop on reject→self-heal-rewrite→reject
  private final val MaxSidecarNodes = 1 << 24
  private final val MaxSidecarTriples = 1 << 27
  /** Bumped when the load path changes materially — r24's first-query gate
    * stamps its clean measurement keyed to this token, so a stamped pass
    * can't keep the gate green across a load-path rewrite. */
  private[graft] final val LoadCodeToken = "ld2"

  /** Order-sensitive FNV-1a over the overlay payload: binds one build
    * generation's sidecar to the stamp written with the SAME generation's
    * parquet (determinism across builds is not required — only that a
    * sidecar and stamp from different generations can never match). */
  private[graph] def overlayFingerprint(grid: TileGrid, bIds: Array[Long],
      bTiles: Array[Int], bLat: Array[Double], bLon: Array[Double],
      triples: Array[(Int, Int, Int)]): Long = {
    var h = 0xcbf29ce484222325L
    def mix(v: Long): Unit = { h ^= v; h *= 0x100000001b3L }
    mix(java.lang.Double.doubleToLongBits(grid.minLat))
    mix(java.lang.Double.doubleToLongBits(grid.minLon))
    mix(java.lang.Double.doubleToLongBits(grid.cellLat))
    mix(java.lang.Double.doubleToLongBits(grid.cellLon))
    mix(grid.cells.toLong); mix(bIds.length.toLong); mix(triples.length.toLong)
    bIds.foreach(mix); bTiles.foreach(t => mix(t.toLong))
    bLat.foreach(v => mix(java.lang.Double.doubleToLongBits(v)))
    bLon.foreach(v => mix(java.lang.Double.doubleToLongBits(v)))
    triples.foreach { t =>
      mix(t._1.toLong); mix(t._2.toLong); mix(t._3.toLong)
    }
    h
  }

  private def saveOverlayStamp(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String, fp: Long): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/overlay.stamp"), true)
    try out.write(java.lang.Long.toHexString(fp)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    finally out.close()
  }

  private def loadOverlayStamp(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/overlay.stamp")
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        val s = new String(bytes, java.nio.charset.StandardCharsets.US_ASCII).trim
        Some(java.lang.Long.parseUnsignedLong(s, 16))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Returns false (writing nothing) when the overlay exceeds the sidecar
    * count bounds — load would reject it anyway, and a build must not ship
    * a file every load rejects and then wastes a full rewrite re-creating.
    * The payload fingerprint is appended AFTER the v1 layout: pre-stamp
    * layouts (no trailing long, no stamp file) still load on the fast path.
    */
  private def saveOverlayBin(fs: org.apache.hadoop.fs.FileSystem, path: String,
                             grid: TileGrid, bIds: Array[Long], bTiles: Array[Int],
                             bLat: Array[Double], bLon: Array[Double],
                             triples: Array[(Int, Int, Int)]): Boolean = {
    if (bIds.length > MaxSidecarNodes || triples.length > MaxSidecarTriples)
      return false
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(path), true), 1 << 16))
    try {
      out.writeInt(OverlayBinMagic); out.writeInt(OverlayBinVersion)
      out.writeDouble(grid.minLat); out.writeDouble(grid.minLon)
      out.writeDouble(grid.cellLat); out.writeDouble(grid.cellLon)
      out.writeInt(grid.cells)
      out.writeInt(bIds.length)
      bIds.foreach(out.writeLong); bTiles.foreach(out.writeInt)
      bLat.foreach(out.writeDouble); bLon.foreach(out.writeDouble)
      out.writeInt(triples.length)
      triples.foreach { t => out.writeInt(t._1); out.writeInt(t._2); out.writeInt(t._3) }
      out.writeLong(overlayFingerprint(grid, bIds, bTiles, bLat, bLon, triples))
    } finally out.close()
    true
  }

  private def loadOverlayBin(fs: org.apache.hadoop.fs.FileSystem, path: String)
      : Option[(TileGrid, Array[Long], Array[Int], Array[Double], Array[Double],
                Array[(Int, Int, Int)], Option[Long])] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) return None
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(p), 1 << 16))
    try {
      if (in.readInt() != OverlayBinMagic || in.readInt() != OverlayBinVersion)
        return None // unknown layout — fall back to the parquet path
      val grid = TileGrid(in.readDouble(), in.readDouble(), in.readDouble(),
        in.readDouble(), in.readInt())
      val nb = in.readInt()
      // corrupt count fields would NegativeArraySize/OOM before any read
      // throws — bound them by what the stream could possibly hold
      if (nb < 0 || nb > MaxSidecarNodes) return None
      val bIds = Array.fill(nb)(in.readLong())
      val bTiles = Array.fill(nb)(in.readInt())
      val bLat = Array.fill(nb)(in.readDouble())
      val bLon = Array.fill(nb)(in.readDouble())
      val m = in.readInt()
      if (m < 0 || m > MaxSidecarTriples) return None
      val triples = Array.fill(m)((in.readInt(), in.readInt(), in.readInt()))
      // trailing fingerprint — absent on pre-stamp sidecars (EOF here is a
      // legacy layout, not corruption; the payload above read completely)
      val fp = try Some(in.readLong()) catch { case _: java.io.EOFException => None }
      Some((grid, bIds, bTiles, bLat, bLon, triples, fp))
    } catch {
      // truncated/corrupt — the parquet path wins (EOF, negative-size and
      // allocation failures alike; corruption must degrade, never crash)
      case scala.util.control.NonFatal(_) => None
    } finally in.close()
  }

  private def overlayCsr(nb: Int, triples: Array[(Int, Int, Int)])
      : (Array[Int], Array[Int], Array[Int]) = {
    val m = triples.length
    val off = new Array[Int](nb + 1)
    triples.foreach(e => off(e._1 + 1) += 1)
    var i = 0
    while (i < nb) { off(i + 1) += off(i); i += 1 }
    val tgt = new Array[Int](m); val w = new Array[Int](m)
    i = 0
    while (i < m) { tgt(i) = triples(i)._2; w(i) = triples(i)._3; i += 1 }
    (off, tgt, w)
  }

  /** CH over the overlay CSR (driver-side, broadcast with the overlay). */
  private def buildOverlayCh(ov: Overlay, bLat: Array[Double],
                             bLon: Array[Double]): graft.algo.ChGraph = {
    val nb = ov.size
    val eCnt = ov.numEdges
    val rOff = new Array[Int](nb + 1)
    var e = 0
    while (e < eCnt) { rOff(ov.tgt(e) + 1) += 1; e += 1 }
    var i = 0
    while (i < nb) { rOff(i + 1) += rOff(i); i += 1 }
    val rTgt = new Array[Int](eCnt); val rW = new Array[Int](eCnt)
    val rCur = rOff.clone()
    var u = 0
    while (u < nb) {
      e = ov.off(u)
      while (e < ov.off(u + 1)) {
        val p = rCur(ov.tgt(e)); rCur(ov.tgt(e)) += 1
        rTgt(p) = u; rW(p) = ov.w(e)
        e += 1
      }
      u += 1
    }
    val pg = new PreparedGraph(bLat, bLon, ov.off, ov.tgt, ov.w,
      new Array[Float](eCnt), rOff, rTgt, rW,
      GridIndex.build(Array.range(0, nb), bLat, bLon))
    graft.algo.ContractionHierarchy.build(pg)
  }

  /** Rehydrate a router from a persisted layout (`build`'s outDir): tiles
    * stay on disk (partition-pruned reads as before), the overlay reloads
    * from parquet, and the CH binary attaches when its fingerprint matches
    * the rebuilt CSR — a missing or stale CH degrades to the exact
    * Dijkstra stitch, never to wrong answers.
    */
  def load(spark: SparkSession, dir: String): TiledRouter = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a stamp (written with the parquet phase) binds the sidecar to THIS
    // build generation: a fingerprint mismatch — or a fingerprint-less
    // legacy sidecar sitting beside a stamp — is a stale leftover from an
    // interrupted rebuild and must lose to the fresh parquet
    val stamp = loadOverlayStamp(fs, dir)
    val fromSidecar = loadOverlayBin(fs, s"$dir/overlay.bin")
      .filter { case (_, _, _, _, _, _, fp) => stamp.forall(s => fp.contains(s)) }
      .map { case (g, a, b, c, d, t, _) => (g, a, b, c, d, t) }
    val (grid, bIds, bTiles, bLat, bLon, triples) =
      fromSidecar.getOrElse {
        val g = spark.read.parquet(s"$dir/grid")
          .select($"min_lat", $"min_lon", $"cell_lat", $"cell_lon", $"cells")
          .as[(Double, Double, Double, Double, Int)].head()
        val nRows = spark.read.parquet(s"$dir/overlay_nodes")
          .select($"idx".cast("int"), $"id".cast("long"), $"tile".cast("int"),
            $"lat".cast("double"), $"lon".cast("double"))
          .as[(Int, Long, Int, Double, Double)].collect().sortBy(_._1)
        val ts = spark.read.parquet(s"$dir/overlay_edges")
          .select($"src".cast("int"), $"dst".cast("int"), $"time_ms".cast("int"))
          .as[(Int, Int, Int)].collect().sorted
        val loaded = (TileGrid(g._1, g._2, g._3, g._4, g._5), nRows.map(_._2),
          nRows.map(_._3), nRows.map(_._4), nRows.map(_._5), ts)
        // self-heal: upgrade a pre-sidecar (or stale-sidecar) layout in
        // place so the NEXT load skips the DataFrame path — sidecar and
        // stamp re-derived together from the canonical parquet (best-effort;
        // a read-only dir or an over-bounds overlay just stays on the slow
        // path, with nothing written)
        try {
          if (saveOverlayBin(fs, s"$dir/overlay.bin", loaded._1, loaded._2,
              loaded._3, loaded._4, loaded._5, ts))
            saveOverlayStamp(fs, dir, overlayFingerprint(loaded._1, loaded._2,
              loaded._3, loaded._4, loaded._5, ts))
        } catch { case _: java.io.IOException => }
        loaded
      }
    val nb = bIds.length
    val bIndex = new java.util.HashMap[Long, Integer](nb * 2)
    var i = 0
    while (i < nb) { bIndex.put(bIds(i), i); i += 1 }
    val (off, tgt, w) = overlayCsr(nb, triples)
    val ov = new Overlay(bIds, bTiles, bIndex, off, tgt, w, bLat, bLon)
    val chPath = new org.apache.hadoop.fs.Path(s"$dir/overlay_ch.bin")
    if (fs.exists(chPath))
      ChStore.loadStream(fs.open(chPath),
        ChStore.fingerprintCsr(off, tgt, w, nb, tgt.length), nb)
        .foreach(ch => ov.ch = ch)
    new TiledRouter(spark, dir, grid, ov)
  }

  /** Batch OD travel times over a tiled layout (SURVEY §9.2 step 3): pairs
    * co-partition by tile, so each task builds only its tile's subgraph and
    * runs one Dijkstra per distinct source (or target) in it; the overlay —
    * the only globally shared state — is broadcast. Shuffles carry pair ids
    * and per-boundary leg distances, never graph data.
    *
    * `pairs`: (pair_id BIGINT, src BIGINT, dst BIGINT) over node ids (the
    * snapped form a production pipeline already has). Returns
    * (pair_id, time_ms) with -1 for unreachable. Exact: same decomposition
    * as [[TiledRouter.travelTimeMs]], proven equal to flat Dijkstra in
    * TiledSpec.
    */
  /** Pair batches at or below this size take the broadcast-queries path in
    * [[matrixTiled]] (two query tuples per pair on the driver + broadcast).
    */
  final val BroadcastPairLimit = 100000

  /** One whole-tile leg computation, shared by both [[matrixTiled]] paths:
    * builds the tile CSR once (forward + reversed) and runs one Dijkstra
    * per DISTINCT (endpoint, direction), shared by that endpoint's pairs.
    * `qs`: (tile, pair_id, endpoint-in-tile, other, other's tile, rev).
    */
  private def tileLegs(ov: Overlay, tile: Int, es: EdgeCols,
                       qs: Array[(Int, Long, Long, Long, Int, Boolean)])
      : Iterator[(Long, Int, Long, Long)] = {
    // node universe: tile interior endpoints + every queried endpoint —
    // primitive dedup (the boxed LinkedHashSet cost ~2 boxed inserts per
    // edge across every tile of the batch)
    val seen = new graft.algo.LongIntHashMap(es.n / 2 + qs.length + 16)
    val idBuf = new graft.algo.LongBuf(es.n / 2 + 16)
    def addId(x: Long): Unit =
      if (seen.get(x) < 0) { seen.put(x, 0); idBuf.add(x) }
    var ei = 0
    while (ei < es.n) { addId(es.src(ei)); addId(es.dst(ei)); ei += 1 }
    qs.foreach { q => addId(q._3); if (q._5 == tile) addId(q._4) }
    val ids = java.util.Arrays.copyOf(idBuf.raw, idBuf.size)
    var i = 0
    val local = buildLocal(ids, new Array[Double](ids.length),
      new Array[Double](ids.length), es)
    // this tile's boundary nodes, as local indices
    val bLocal = new scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    i = 0
    while (i < ids.length) {
      val oi = ov.index.get(ids(i))
      if (oi != null && ov.tiles(oi.intValue) == tile) bLocal += ((i, ids(i)))
      i += 1
    }
    // single-entry memo: queries are processed sorted by (endpoint, rev),
    // so duplicate endpoints are adjacent and one retained result suffices.
    // The former unbounded HashMap held EVERY Dijkstra result of the task
    // — a hot tile with 1000 endpoint queries pinned 1000 × |tile| longs
    // (~1.2 GB) live, and the stage spent a third of its time in GC.
    var memoKey = Long.MinValue
    var memo: Array[Long] = null
    def distsFrom(node: Long, rev: Boolean): Array[Long] = {
      val key = (node << 1) | (if (rev) 1L else 0L)
      if (key != memoKey) {
        memo = local.distancesFrom(local.index.get(node).intValue, reverse = rev)
        memoKey = key
      }
      memo
    }
    val qsSorted = qs.sortBy(q => (q._3, q._6))
    qsSorted.iterator.flatMap { case (_, pairId, endpoint, other, otherTile, rev) =>
      val dist = distsFrom(endpoint, rev)
      val direct =
        if (!rev && otherTile == tile) {
          val oi = local.index.get(other)
          if (oi != null && dist(oi.intValue) != Long.MaxValue)
            Iterator.single((pairId, 0, other, dist(oi.intValue)))
          else Iterator.empty
        } else Iterator.empty
      val kind = if (rev) 2 else 1
      direct ++ bLocal.iterator.flatMap { case (bi, bid) =>
        if (dist(bi) == Long.MaxValue) Iterator.empty
        else Iterator.single((pairId, kind, bid, dist(bi)))
      }
    }
  }

  /** The broadcast path's safety precondition: every touched tile's data
    * is EXACTLY ONE parquet file (what [[build]] writes since the
    * repartition-by-tile layout), so an executor task holds the complete
    * tile subgraph. Legacy multi-file layouts return None → shuffle path.
    */
  private def singleFilePerTile(spark: SparkSession, dir: String,
                                touched: Array[Int]): Option[Map[Int, String]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$dir/interior")
    val fs = root.getFileSystem(conf)
    val out = scala.collection.mutable.Map.empty[Int, String]
    touched.foreach { t =>
      val d = new org.apache.hadoop.fs.Path(root, s"tile=$t")
      if (fs.exists(d)) {
        val data = fs.listStatus(d).filter { st =>
          val n = st.getPath.getName
          st.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        if (data.length != 1) return None
        out(t) = data(0).getPath.toString
      }
      // a touched tile with no interior dir has no interior edges: nothing
      // to read, tileLegs still answers its queries over an empty CSR —
      // so it needs no file entry
    }
    Some(out.toMap)
  }

  /** One tile's interior edge list as primitive column arrays — the
    * allocation-light replacement for Array[(Long, Long, Long)]: the boxed
    * triple per edge (~38M tuples across an Italy-scale batch) was a
    * measurable slice of the tile-legs stage's GC.
    */
  private[graph] final class EdgeCols(initial: Int) extends Serializable {
    var src = new Array[Long](math.max(16, initial))
    var dst = new Array[Long](src.length)
    var w = new Array[Long](src.length)
    var n = 0
    def append(s: Long, d: Long, t: Long): Unit = {
      if (n == src.length) {
        src = java.util.Arrays.copyOf(src, n << 1)
        dst = java.util.Arrays.copyOf(dst, n << 1)
        w = java.util.Arrays.copyOf(w, n << 1)
      }
      src(n) = s; dst(n) = d; w(n) = t
      n += 1
    }
  }

  private object EdgeCols {
    val empty = new EdgeCols(1)
    def fromIterator(it: Iterator[(Long, Long, Long)]): EdgeCols = {
      val c = new EdgeCols(1024)
      it.foreach(e => c.append(e._1, e._2, e._3))
      c
    }
  }

  /** Parquet ReadSupport materializing (src, dst, time_ms) rows straight
    * into [[EdgeCols]] primitive arrays — no Group objects, no per-row
    * allocation (the example GroupReadSupport built a Group per row, which
    * dominated executor-side tile reads).
    */
  private final class EdgeReadSupport
      extends org.apache.parquet.hadoop.api.ReadSupport[EdgeCols] {
    override def init(context: org.apache.parquet.hadoop.api.InitContext)
        : org.apache.parquet.hadoop.api.ReadSupport.ReadContext =
      new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
        org.apache.parquet.schema.MessageTypeParser.parseMessageType(
          "message edge { optional int64 src; optional int64 dst; " +
            "optional int64 time_ms; }"))
    override def prepareForRead(
        conf: org.apache.hadoop.conf.Configuration,
        keyValueMetaData: java.util.Map[String, String],
        fileSchema: org.apache.parquet.schema.MessageType,
        readContext: org.apache.parquet.hadoop.api.ReadSupport.ReadContext)
        : org.apache.parquet.io.api.RecordMaterializer[EdgeCols] =
      new org.apache.parquet.io.api.RecordMaterializer[EdgeCols] {
        private val cols = new EdgeCols(4096)
        private var cs = 0L; private var cd = 0L; private var cw = 0L
        private val root = new org.apache.parquet.io.api.GroupConverter {
          private val conv: Array[org.apache.parquet.io.api.Converter] = Array(
            new org.apache.parquet.io.api.PrimitiveConverter {
              override def addLong(v: Long): Unit = cs = v
            },
            new org.apache.parquet.io.api.PrimitiveConverter {
              override def addLong(v: Long): Unit = cd = v
            },
            new org.apache.parquet.io.api.PrimitiveConverter {
              override def addLong(v: Long): Unit = cw = v
            })
          override def getConverter(i: Int): org.apache.parquet.io.api.Converter =
            conv(i)
          override def start(): Unit = ()
          override def end(): Unit = cols.append(cs, cd, cw)
        }
        override def getCurrentRecord: EdgeCols = cols
        override def getRootConverter: org.apache.parquet.io.api.GroupConverter =
          root
      }
  }

  /** Executor-side whole-file read of one tile's (src, dst, time_ms) rows —
    * plain parquet-hadoop, no splitting, no shuffle, primitive columns.
    *
    * Decoded tiles are held in a JVM-wide SOFT-reference cache keyed by
    * file path — the executor-side twin of [[TiledRouter]]'s documented
    * tile LRU: the layout is immutable (a rebuild writes new unique part
    * file names), several query chunks of one hot tile land on the same
    * executor, and the parquet record-assembly was the dominant cost of
    * the legs stage (926 s of read wall across one r24 witness pass's
    * duplicated chunk reads). Soft references keep the bound
    * memory-adaptive: the GC reclaims tiles under pressure, so the cache
    * never outgrows the executor heap at planet tile counts.
    */
  private val tileEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[EdgeCols]]()

  private def readTileParquet(path: String,
      conf: org.apache.hadoop.conf.Configuration): EdgeCols = {
    val hit = tileEdgeCache.get(path)
    if (hit != null) {
      val v = hit.get()
      if (v != null) return v
    }
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new EdgeReadSupport(), new org.apache.hadoop.fs.Path(path))
      .withConf(conf).build()
    val cols =
      try {
        var last: EdgeCols = null
        var g = reader.read()
        while (g != null) { last = g; g = reader.read() }
        if (last == null) EdgeCols.empty else last
      } finally reader.close()
    tileEdgeCache.put(path, new java.lang.ref.SoftReference(cols))
    cols
  }

  /** Minimal serializable Hadoop-conf carrier (Spark's own is private). */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  def matrix(spark: SparkSession, dir: String, overlay: Overlay,
             pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val nt = spark.read.parquet(s"$dir/nodes").select($"id", $"tile".cast("int").as("tile"))
    val pt = pairs
      .select($"pair_id".cast("long"), $"src".cast("long"), $"dst".cast("long"))
      .join(nt.select($"id".as("src"), $"tile".as("src_tile")), "src")
      .join(nt.select($"id".as("dst"), $"tile".as("dst_tile")), "dst")
      .select($"pair_id", $"src", $"dst", $"src_tile", $"dst_tile")
    matrixTiled(spark, dir, overlay, pt,
      pairs.select($"pair_id".cast("long")))
  }

  /** [[matrix]] with tiles already resolved — the form [[matrixByCoords]]
    * feeds directly from [[snap]] output, skipping two joins against the
    * full node table.
    *
    * `pt0`: (pair_id, src, dst, src_tile, dst_tile); `allPairIds` keeps
    * unanswerable pairs in the output as -1 (null → pt0's own ids).
    */
  def matrixTiled(spark: SparkSession, dir: String, overlay: Overlay,
                  pt0: DataFrame, allPairIds: DataFrame = null): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(overlay)
    // materialize the (small, batch-sized) pair set once: it feeds three
    // consumers (tile-set collect, fwd/bwd queries, final right join) and
    // upstream may be a snap over the full node table — without the cut
    // that scan would run once per consumer
    val pt = pt0.select($"pair_id".cast("long"), $"src".cast("long"),
        $"dst".cast("long"), $"src_tile".cast("int"), $"dst_tile".cast("int"))
      .as[(Long, Long, Long, Int, Int)]
      .localCheckpoint(true)
    // the tile set this batch touches: partition-prunes the interior read
    // (a planet layout has thousands of tiles; batches rarely span them all)
    val touched = pt.flatMap(p => Iterator(p._4, p._5)).distinct().collect()
    val interiorByTile = spark.read.parquet(s"$dir/interior")
      .filter($"tile".isin(touched.map(Integer.valueOf).toSeq: _*))
      .select($"tile".cast("int"), $"src", $"dst", $"time_ms")
      .as[(Int, Long, Long, Long)].groupByKey(_._1)

    // The pair batch is usually tiny next to the graph: when it is bounded
    // AND the layout guarantees one whole file per tile, BROADCAST the
    // queries and stream the tile files — the graph never shuffles at all.
    // Past the bound (or on a legacy multi-file layout) fall back to the
    // single interior shuffle that carries both leg directions.
    val pairCnt = pt.count() // cheap: pt is checkpointed
    val tileFiles =
      if (pairCnt <= BroadcastPairLimit) singleFilePerTile(spark, dir, touched)
      else None

    // legs: (pair_id, kind, node, dist) — kind 0 = direct same-tile distance
    // (node unused), 1 = source→boundary, 2 = boundary→target
    val legs = tileFiles match {
      case Some(files) =>
        // hot-tile split (guide §2.5 — a skewed batch can land half its
        // endpoints in ONE tile, serializing that tile's Dijkstras into a
        // straggler task: r24's same-tile witness put ~1000 of 2000
        // endpoint queries in tile 0 and the stage wall was 17 s for 74 s
        // of task time). Queries are sorted by (endpoint, rev) so
        // duplicate endpoints stay in one chunk and keep sharing the
        // per-chunk Dijkstra cache; each extra chunk re-reads its tile
        // file — cheap next to the Dijkstras it parallelizes.
        val allQ = pt.collect().flatMap { case (pid, src, dst, st, dt) =>
          Iterator((st, pid, src, dst, dt, false), (dt, pid, dst, src, st, true))
        }
        val chunkSize = math.max(16,
          allQ.length / math.max(1, 2 * spark.sparkContext.defaultParallelism))
        val qChunks: Map[Int, Array[Array[(Int, Long, Long, Long, Int, Boolean)]]] =
          allQ.groupBy(_._1).map { case (t, qs) =>
            t -> qs.sortBy(q => (q._3, q._6)).grouped(chunkSize).toArray
          }
        val bcQ = spark.sparkContext.broadcast(qChunks)
        val bcConf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
        // every tile with queries runs, even one with no interior edges
        // (isolated endpoints still answer, matching the cogroup path)
        val work = qChunks.toSeq.sortBy(_._1).flatMap { case (t, chunks) =>
          chunks.indices.map(ci => (t, ci, files.get(t)))
        }
        spark.createDataset(spark.sparkContext
          .parallelize(work, math.max(1, work.size))
          .flatMap { case (tile, ci, pathOpt) =>
            val trace = sys.env.contains("GRAFT_TILE_TRACE")
            val mx = java.lang.management.ManagementFactory.getThreadMXBean
            val c0 = if (trace) mx.getCurrentThreadCpuTime else 0L
            val t0 = System.nanoTime()
            val es = pathOpt.map(p => readTileParquet(p, bcConf.value))
              .getOrElse(EdgeCols.empty)
            val t1 = System.nanoTime()
            val out = tileLegs(bc.value, tile, es, bcQ.value(tile)(ci)).toArray
            val t2 = System.nanoTime()
            if (trace) {
              val cpu = (mx.getCurrentThreadCpuTime - c0) / 1e9
              System.err.println(f"[tileLegs] tile=$tile chunk=$ci edges=${es.n} q=${bcQ.value(tile)(ci).length} read=${(t1 - t0) / 1e9}%.2fs legs=${out.length} legsT=${(t2 - t1) / 1e9}%.2fs cpu=$cpu%.2fs")
            }
            out
          })
      case None =>
        // queries: (tile, pair_id, endpoint-in-tile, other, other's tile, rev)
        val queries = pt.flatMap { case (pid, src, dst, st, dt) =>
          Iterator((st, pid, src, dst, dt, false), (dt, pid, dst, src, st, true))
        }.groupByKey(_._1)
        interiorByTile.cogroup(queries) { (tile, eIt, qIt) =>
          val qs = qIt.toArray
          if (qs.isEmpty) Iterator.empty
          else tileLegs(bc.value, tile,
            EdgeCols.fromIterator(eIt.map(e => (e._2, e._3, e._4))), qs)
        }
    }

    legs
      .groupByKey(_._1)
      .mapGroups { (pairId, legIt) =>
        val ov = bc.value
        val nb = ov.size
        var best = Long.MaxValue
        val seeds = new scala.collection.mutable.ArrayBuffer[(Int, Long)]()
        val targets = new java.util.HashMap[Integer, java.lang.Long]()
        legIt.foreach { case (_, kind, node, d) =>
          if (kind == 0) best = math.min(best, d)
          else {
            val oi = ov.index.get(node)
            if (oi != null) {
              if (kind == 1) seeds += ((oi.intValue, d))
              else {
                val prev = targets.get(oi)
                if (prev == null || d < prev.longValue) targets.put(oi, d)
              }
            }
          }
        }
        if (seeds.nonEmpty && !targets.isEmpty && ov.ch != null) {
          // CH stitch (see Overlay.ch): per-pair cost is the CH search
          // space of the two boundary sets, not an overlay-wide Dijkstra
          val tIdx = new Array[Int](targets.size)
          val tOff = new Array[Long](targets.size)
          var ti = 0
          val tIt = targets.entrySet().iterator()
          while (tIt.hasNext) {
            val en = tIt.next()
            tIdx(ti) = en.getKey.intValue; tOff(ti) = en.getValue.longValue; ti += 1
          }
          val j = graft.algo.ChQuery.forGraph(ov.ch).shortestSetJoinMs(
            seeds.map(_._1).toArray, seeds.map(_._2).toArray, tIdx, tOff)
          best = math.min(best, j)
        } else if (seeds.nonEmpty && !targets.isEmpty) {
          val dist = Array.fill(nb)(Long.MaxValue)
          val pq = new graft.algo.LongMinHeap(256)
          seeds.foreach { case (i, d) =>
            if (d < dist(i)) { dist(i) = d; pq.add(d, i) }
          }
          while (!pq.isEmpty) {
            val d = pq.topDist; val v = pq.topNode
            pq.removeTop()
            if (d == dist(v) && d < best) {
              val t = targets.get(v)
              if (t != null) best = math.min(best, d + t.longValue)
              var e = ov.off(v)
              while (e < ov.off(v + 1)) {
                val nd = d + ov.w(e)
                if (nd < dist(ov.tgt(e))) {
                  dist(ov.tgt(e)) = nd
                  pq.add(nd, ov.tgt(e))
                }
                e += 1
              }
            }
          }
        }
        (pairId, if (best == Long.MaxValue) -1L else best)
      }
      .toDF("pair_id", "time_ms")
      // pairs that produced no legs at all (fully isolated endpoints) are
      // still answered: -1
      .join(Option(allPairIds).getOrElse(pt.toDF("pair_id", "src", "dst", "st", "dt"))
          .select($"pair_id".cast("long")).distinct(),
        Seq("pair_id"), "right")
      .na.fill(-1L, Seq("time_ms"))
  }

  /** Distributed snap: nearest tile-local node for every (id, lat, lon)
    * point — the missing front half of coordinate-input batch workloads.
    * Points co-partition with their tile's node set (cogroup), each task
    * scans only its tile (same semantics as [[TiledRouter.travelTimeMs]]'s
    * per-tile nearest). Points landing in an empty tile return node -1.
    */
  def snap(spark: SparkSession, dir: String, grid: TileGrid,
           points: DataFrame): DataFrame = {
    import spark.implicits._
    val bcGrid = spark.sparkContext.broadcast(grid)
    val pts = points
      .select($"id".cast("long"), $"lat".cast("double"), $"lon".cast("double"))
      .as[(Long, Double, Double)]
    val ptArr = pts.take(BroadcastPairLimit * 2 + 1)
    if (ptArr.length <= BroadcastPairLimit * 2) {
      // bounded batch: broadcast the points, STREAM the node partitions —
      // the node table never shuffles; the shuffle carries only one
      // (point, candidate) row per scan partition that saw the point's
      // tile, min-reduced to the nearest. Ties break on node id so the
      // result is layout-independent. The inner loop runs once per
      // (node-in-touched-tile × point-in-that-tile) — ~300M iterations at
      // the r24 witness — so the per-point best state is PRIMITIVE slot
      // arrays indexed by a dense point slot (the former boxed
      // HashMap[Long, (Double, Long, Int)] cost one boxed lookup and a
      // tuple allocation per improvement; profiler: 83 s task time).
      val byTile: Map[Int, Array[(Long, Double, Double)]] =
        ptArr.groupBy(p => bcGrid.value.tileOf(p._2, p._3))
      // dense slots per tile: (pids, lats, lons, global slot base)
      val slotBase = scala.collection.mutable.Map.empty[Int, Int]
      var acc = 0
      val tilesSorted = byTile.keys.toArray.sorted
      tilesSorted.foreach { t => slotBase(t) = acc; acc += byTile(t).length }
      val nSlots = acc
      final case class TilePts(base: Int, pids: Array[Long],
          lats: Array[Double], lons: Array[Double])
      val packed: Map[Int, TilePts] = byTile.map { case (t, ps) =>
        t -> TilePts(slotBase(t), ps.map(_._1), ps.map(_._2), ps.map(_._3))
      }
      val bcPts = spark.sparkContext.broadcast(packed)
      val allPids = {
        val a = new Array[Long](nSlots)
        packed.values.foreach { tp =>
          System.arraycopy(tp.pids, 0, a, tp.base, tp.pids.length)
        }
        a
      }
      val bcPids = spark.sparkContext.broadcast(allPids)
      val touched = byTile.keys.map(Integer.valueOf).toSeq
      spark.read.parquet(s"$dir/nodes")
        .filter($"tile".isin(touched: _*))
        .select($"tile".cast("int"), $"id".cast("long"),
          $"lat".cast("double"), $"lon".cast("double"))
        .as[(Int, Long, Double, Double)]
        .mapPartitions { rows =>
          val trace = sys.env.contains("GRAFT_TILE_TRACE")
          val mx = java.lang.management.ManagementFactory.getThreadMXBean
          val c0 = if (trace) mx.getCurrentThreadCpuTime else 0L
          val t0 = System.nanoTime()
          var nRows = 0L
          val m = bcPts.value
          val n = bcPids.value.length
          val bestD = Array.fill(n)(Double.MaxValue)
          val bestN = Array.fill(n)(-1L)
          val bestT = Array.fill(n)(-1)
          var lastTile = Int.MinValue
          var cur: TilePts = null
          rows.foreach { case (tile, nid, nlat, nlon) =>
            nRows += 1
            if (tile != lastTile) { cur = m.getOrElse(tile, null); lastTile = tile }
            if (cur != null) {
              var i = 0
              val pl = cur.pids.length
              while (i < pl) {
                val s = cur.base + i
                // d >= dLat² always, so a candidate with dLat² > bestD can
                // never win (not even on the nid tie at d == bestD): skip
                // the cos for the ~99% of nodes that are latitude-far
                val dLat = nlat - cur.lats(i)
                if (dLat * dLat <= bestD(s)) {
                  val d = graft.geo.Geo.approxDist2(cur.lats(i), cur.lons(i), nlat, nlon)
                  if (d < bestD(s) || (d == bestD(s) && nid < bestN(s))) {
                    bestD(s) = d; bestN(s) = nid; bestT(s) = tile
                  }
                }
                i += 1
              }
            }
          }
          if (trace) {
            val cpu = (mx.getCurrentThreadCpuTime - c0) / 1e9
            System.err.println(f"[snap] rows=$nRows wall=${(System.nanoTime() - t0) / 1e9}%.2fs cpu=$cpu%.2fs")
          }
          (0 until n).iterator.filter(bestN(_) >= 0)
            .map(s => (bcPids.value(s), bestD(s), bestN(s), bestT(s)))
        }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          if (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)) a else b
        }
        .map { case (pid, (_, _, node, tile)) => (pid, node, tile) }
        .toDF("id", "node", "tile")
        // points whose tile has no nodes still answer: node -1
        .join(pts.toDF("id", "plat", "plon").select($"id"), Seq("id"), "right")
        .na.fill(-1L, Seq("node")).na.fill(-1, Seq("tile"))
    } else snapShuffle(spark, dir, bcGrid, pts)
  }

  /** Unbounded-batch snap: points co-partition with their tile's nodes. */
  private def snapShuffle(spark: SparkSession, dir: String,
      bcGrid: org.apache.spark.broadcast.Broadcast[TileGrid],
      pts: org.apache.spark.sql.Dataset[(Long, Double, Double)]): DataFrame = {
    import spark.implicits._
    val byTile = pts.groupByKey(p => bcGrid.value.tileOf(p._2, p._3))
    val nodesByTile = spark.read.parquet(s"$dir/nodes")
      .select($"tile".cast("int"), $"id".cast("long"),
        $"lat".cast("double"), $"lon".cast("double"))
      .as[(Int, Long, Double, Double)]
      .groupByKey(_._1)
    nodesByTile.cogroup(byTile) { (tile, nIt, pIt) =>
      val ps = pIt.toArray
      if (ps.isEmpty) Iterator.empty
      else {
        val ns = nIt.toArray
        ps.iterator.map { case (pid, plat, plon) =>
          var best = -1L; var bestD = Double.MaxValue
          var i = 0
          while (i < ns.length) {
            // dLat² lower bound skips the cos for latitude-far nodes
            // (d >= dLat², so dLat² > bestD can never win — even on ties)
            val dLat = ns(i)._3 - plat
            if (dLat * dLat <= bestD) {
              val d = graft.geo.Geo.approxDist2(plat, plon, ns(i)._3, ns(i)._4)
              if (d < bestD || (d == bestD && ns(i)._2 < best)) {
                bestD = d; best = ns(i)._2
              }
            }
            i += 1
          }
          (pid, best, tile)
        }
      }
    }.toDF("id", "node", "tile")
  }

  /** Coordinate-input batch OD matrix: snap both endpoints (distributed,
    * tile-co-partitioned), then run the node-id [[matrix]]. Returns
    * (pair_id, time_ms); -1 for unreachable or unsnappable endpoints.
    */
  def matrixByCoords(spark: SparkSession, dir: String, grid: TileGrid,
                     overlay: Overlay, pairs: DataFrame): DataFrame = {
    import spark.implicits._
    // ONE snap pass over both endpoint sets (src tagged even, dst odd), and
    // snap's tile rides along so the matrix needs no node-table joins
    val srcPts = pairs.select(($"pair_id".cast("long") * 2).as("id"),
      $"src_lat".as("lat"), $"src_lon".as("lon"))
    val dstPts = pairs.select(($"pair_id".cast("long") * 2 + 1).as("id"),
      $"dst_lat".as("lat"), $"dst_lon".as("lon"))
    // materialize the (batch-sized) snap output ONCE before the src/dst
    // split: the two filter branches below are both join inputs, and Spark
    // plans the snap subtree (a full scan of every touched tile's nodes)
    // once PER BRANCH — the localCheckpoint halves the node-table work
    val snapped = snap(spark, dir, grid, srcPts.unionByName(dstPts))
      .localCheckpoint(true)
    val src = snapped.filter($"id" % 2 === 0).select(($"id" / 2).cast("long").as("pair_id"),
      $"node".as("src"), $"tile".as("src_tile"))
    val dst = snapped.filter($"id" % 2 === 1).select(($"id" / 2).cast("long").as("pair_id"),
      $"node".as("dst"), $"tile".as("dst_tile"))
    val joined = src.join(dst, "pair_id")
    val ok = joined.filter($"src" >= 0 && $"dst" >= 0)
    val bad = joined.filter($"src" < 0 || $"dst" < 0)
      .select($"pair_id", lit(-1L).as("time_ms"))
    matrixTiled(spark, dir, overlay, ok)
      .unionByName(bad)
  }

  final case class TileGrid(minLat: Double, minLon: Double,
                            cellLat: Double, cellLon: Double, cells: Int) {
    def tileOf(lat: Double, lon: Double): Int = {
      val ti = math.min(cells - 1, math.max(0, ((lat - minLat) / cellLat).toInt))
      val tj = math.min(cells - 1, math.max(0, ((lon - minLon) / cellLon).toInt))
      ti * cells + tj
    }
  }

  /** Boundary-node overlay graph (CSR over dense boundary indices). */
  final class Overlay(
      val ids: Array[Long], val tiles: Array[Int],
      val index: java.util.HashMap[Long, Integer],
      val off: Array[Int], val tgt: Array[Int], val w: Array[Int],
      val lat: Array[Double], val lon: Array[Double]) extends Serializable {
    def size: Int = ids.length
    def numEdges: Int = tgt.length

    /** Contraction hierarchy over the overlay (built once driver-side in
      * [[Tiled.build]], shipped with the broadcast). At planet scale the
      * overlay is still millions of nodes — a plain multi-source Dijkstra
      * per OD pair over it is the stitch's bottleneck; the CH search space
      * per pair is a few hundred nodes regardless of overlay size. Null
      * when the overlay exceeded the build gate (queries fall back to the
      * exact Dijkstra stitch).
      */
    @volatile var ch: graft.algo.ChGraph = null
  }
}

/** Point-query router over a tiled graph: only the overlay plus an LRU of
  * `cacheTiles` tile subgraphs is ever resident.
  */
final class TiledRouter(spark: SparkSession, val dir: String, val grid: Tiled.TileGrid,
                        val overlay: Tiled.Overlay, cacheTiles: Int = 8) {

  private val cache = new java.util.LinkedHashMap[Int, Tiled.TileLocal](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Int, Tiled.TileLocal]): Boolean =
      size() > cacheTiles
  }

  /** Load one tile's interior subgraph (partition-pruned parquet read). */
  private def tile(tid: Int): Tiled.TileLocal = synchronized {
    val hit = cache.get(tid)
    if (hit != null) return hit
    import spark.implicits._
    val ns = spark.read.parquet(s"$dir/nodes").filter($"tile" === tid)
      .select($"id".cast("long"), $"lat".cast("double"), $"lon".cast("double"))
      .as[(Long, Double, Double)].collect()
    val es = spark.read.parquet(s"$dir/interior").filter($"tile" === tid)
      .select($"src".cast("long"), $"dst".cast("long"), $"time_ms".cast("long"))
      .as[(Long, Long, Long)].collect()
    val ec = new Tiled.EdgeCols(es.length)
    es.foreach(e => ec.append(e._1, e._2, e._3))
    val loaded = Tiled.buildLocal(ns.map(_._1), ns.map(_._2), ns.map(_._3), ec)
    cache.put(tid, loaded)
    loaded
  }

  /** Exact travel time in ms between the nearest tile nodes to the given
    * coordinates; -1 when unreachable. Loads at most two tiles.
    */
  def travelTimeMs(srcLat: Double, srcLon: Double,
                   dstLat: Double, dstLon: Double): Long = {
    val ts = grid.tileOf(srcLat, srcLon); val td = grid.tileOf(dstLat, dstLon)
    val tileS = tile(ts); val tileD = tile(td)
    if (tileS.ids.isEmpty || tileD.ids.isEmpty) return -1L
    val sL = tileS.nearest(srcLat, srcLon); val dL = tileD.nearest(dstLat, dstLon)
    if (sL < 0 || dL < 0) return -1L
    if (ts == td && sL == dL) return 0L

    val fwd = tileS.distancesFrom(sL, reverse = false)
    val bwd = tileD.distancesFrom(dL, reverse = true)
    // candidate 1: stay inside the (shared) tile
    var best = if (ts == td && fwd(dL) != Long.MaxValue) fwd(dL) else Long.MaxValue

    // candidate 2: src tile boundary → overlay → dst tile boundary
    val nb = overlay.size
    if (overlay.ch != null) {
      // CH stitch: the two boundary sets seed a set-to-set CH query whose
      // search space is a few hundred nodes no matter how big the overlay
      val sIdx = new scala.collection.mutable.ArrayBuffer[Int]()
      val sOff = new scala.collection.mutable.ArrayBuffer[Long]()
      val tIdx = new scala.collection.mutable.ArrayBuffer[Int]()
      val tOff = new scala.collection.mutable.ArrayBuffer[Long]()
      var i = 0
      while (i < nb) {
        if (overlay.tiles(i) == ts) {
          val li = tileS.index.get(overlay.ids(i))
          if (li != null && fwd(li.intValue) != Long.MaxValue) {
            sIdx += i; sOff += fwd(li.intValue)
          }
        }
        if (overlay.tiles(i) == td) {
          val li = tileD.index.get(overlay.ids(i))
          if (li != null && bwd(li.intValue) != Long.MaxValue) {
            tIdx += i; tOff += bwd(li.intValue)
          }
        }
        i += 1
      }
      if (sIdx.nonEmpty && tIdx.nonEmpty) {
        val j = graft.algo.ChQuery.forGraph(overlay.ch)
          .shortestSetJoinMs(sIdx.toArray, sOff.toArray, tIdx.toArray, tOff.toArray)
        best = math.min(best, j)
      }
    } else {
      val dist = Array.fill(nb)(Long.MaxValue)
      val pq = new graft.algo.LongMinHeap(256)
      var i = 0
      while (i < nb) {
        if (overlay.tiles(i) == ts) {
          val li = tileS.index.get(overlay.ids(i))
          if (li != null && fwd(li.intValue) != Long.MaxValue) {
            dist(i) = fwd(li.intValue)
            pq.add(dist(i), i)
          }
        }
        i += 1
      }
      while (!pq.isEmpty) {
        val d = pq.topDist; val v = pq.topNode
        pq.removeTop()
        if (d == dist(v) && d < best) {
          if (overlay.tiles(v) == td) {
            val li = tileD.index.get(overlay.ids(v))
            if (li != null && bwd(li.intValue) != Long.MaxValue)
              best = math.min(best, d + bwd(li.intValue))
          }
          var e = overlay.off(v)
          while (e < overlay.off(v + 1)) {
            val nd = d + overlay.w(e)
            if (nd < dist(overlay.tgt(e))) {
              dist(overlay.tgt(e)) = nd
              pq.add(nd, overlay.tgt(e))
            }
            e += 1
          }
        }
      }
    }
    if (best == Long.MaxValue) -1L else best
  }

  /** Exact isochrone: every node reachable within `budgetMs`, with its
    * exact distance. Decomposition: forward distances inside the source
    * tile; budget-bounded overlay Dijkstra for exact boundary distances;
    * then ONE multi-source in-tile Dijkstra per tile that has a reached
    * boundary node (seeded with those distances). Only tiles the isochrone
    * actually touches are ever loaded — the work scales with the budget's
    * footprint, not the graph.
    */
  def isochrone(srcLat: Double, srcLon: Double,
                budgetMs: Long): Array[(Long, Long)] = {
    val ts = grid.tileOf(srcLat, srcLon)
    val tileS = tile(ts)
    if (tileS.ids.isEmpty) return Array.empty
    val sL = tileS.nearest(srcLat, srcLon)
    if (sL < 0) return Array.empty

    val best = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    def offer(id: Long, d: Long): Unit =
      if (d <= budgetMs) {
        val prev = best.get(id)
        if (prev == null || d < prev.longValue) best.put(id, d)
      }

    // 1) source tile, direct
    val fwd = tileS.distancesFrom(sL, reverse = false)
    var i = 0
    while (i < tileS.ids.length) {
      if (fwd(i) != Long.MaxValue) offer(tileS.ids(i), fwd(i))
      i += 1
    }

    // 2) overlay, budget-bounded, seeded from the source tile's boundary
    val nb = overlay.size
    val dist = Array.fill(nb)(Long.MaxValue)
    val pq = new graft.algo.LongMinHeap(256)
    i = 0
    while (i < nb) {
      if (overlay.tiles(i) == ts) {
        val li = tileS.index.get(overlay.ids(i))
        if (li != null && fwd(li.intValue) != Long.MaxValue && fwd(li.intValue) <= budgetMs) {
          dist(i) = fwd(li.intValue)
          pq.add(dist(i), i)
        }
      }
      i += 1
    }
    while (!pq.isEmpty) {
      val d = pq.topDist; val v = pq.topNode
      pq.removeTop()
      if (d == dist(v)) {
        var e = overlay.off(v)
        while (e < overlay.off(v + 1)) {
          val nd = d + overlay.w(e)
          if (nd <= budgetMs && nd < dist(overlay.tgt(e))) {
            dist(overlay.tgt(e)) = nd
            pq.add(nd, overlay.tgt(e))
          }
          e += 1
        }
      }
    }

    // 3) one multi-source expansion per touched tile
    val seedsByTile = new java.util.HashMap[Integer, scala.collection.mutable.ArrayBuffer[(Long, Long)]]()
    i = 0
    while (i < nb) {
      if (dist(i) != Long.MaxValue) {
        offer(overlay.ids(i), dist(i))
        var buf = seedsByTile.get(overlay.tiles(i))
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          seedsByTile.put(overlay.tiles(i), buf)
        }
        buf += ((overlay.ids(i), dist(i)))
      }
      i += 1
    }
    val tIt = seedsByTile.entrySet().iterator()
    while (tIt.hasNext) {
      val en = tIt.next()
      val tid = en.getKey.intValue
      val tl = tile(tid)
      val n = tl.ids.length
      val td = Array.fill(n)(Long.MaxValue)
      val tpq = new graft.algo.LongMinHeap(256)
      en.getValue.foreach { case (gid, d0) =>
        val li = tl.index.get(gid)
        if (li != null && d0 < td(li.intValue)) {
          td(li.intValue) = d0
          tpq.add(d0, li.intValue)
        }
      }
      while (!tpq.isEmpty) {
        val d = tpq.topDist; val v = tpq.topNode
        tpq.removeTop()
        if (d == td(v)) {
          var e = tl.off(v)
          while (e < tl.off(v + 1)) {
            val nd = d + tl.w(e)
            if (nd <= budgetMs && nd < td(tl.tgt(e))) {
              td(tl.tgt(e)) = nd
              tpq.add(nd, tl.tgt(e))
            }
            e += 1
          }
        }
      }
      var j = 0
      while (j < n) {
        if (td(j) != Long.MaxValue) offer(tl.ids(j), td(j))
        j += 1
      }
    }

    val out = new Array[(Long, Long)](best.size())
    val bIt = best.entrySet().iterator()
    i = 0
    while (bIt.hasNext) {
      val en = bIt.next()
      out(i) = (en.getKey.longValue, en.getValue.longValue)
      i += 1
    }
    out.sortBy(_._1)
  }

  /** Exact shortest route with geometry: total ms plus the full waypoint
    * sequence as (lat, lon) pairs; None when unreachable. Same
    * decomposition as [[travelTimeMs]] with parent tracking everywhere;
    * within-tile overlay legs re-expand through a parent-tracked Dijkstra
    * inside their tile (same LRU). Geometry always uses the Dijkstra
    * stitch: a CH cannot unpack paths without via-node records, and
    * reconstruction — not the overlay search — dominates route queries.
    */
  def route(srcLat: Double, srcLon: Double,
            dstLat: Double, dstLon: Double): Option[(Long, Array[(Double, Double)])] = {
    val ts = grid.tileOf(srcLat, srcLon); val td = grid.tileOf(dstLat, dstLon)
    val tileS = tile(ts); val tileD = tile(td)
    if (tileS.ids.isEmpty || tileD.ids.isEmpty) return None
    val sL = tileS.nearest(srcLat, srcLon); val dL = tileD.nearest(dstLat, dstLon)
    if (sL < 0 || dL < 0) return None
    if (ts == td && sL == dL)
      return Some((0L, Array((tileS.lat(sL), tileS.lon(sL)))))

    val (fwd, fPar) = tileS.distancesWithParents(sL, reverse = false)
    val (bwd, bPar) = tileD.distancesWithParents(dL, reverse = true)

    var best = if (ts == td && fwd(dL) != Long.MaxValue) fwd(dL) else Long.MaxValue
    var bestV = -1 // overlay exit node when the best path crosses the overlay

    val nb = overlay.size
    val dist = Array.fill(nb)(Long.MaxValue)
    val par = Array.fill(nb)(-1)
    val pq = new graft.algo.LongMinHeap(256)
    var i = 0
    while (i < nb) {
      if (overlay.tiles(i) == ts) {
        val li = tileS.index.get(overlay.ids(i))
        if (li != null && fwd(li.intValue) != Long.MaxValue) {
          dist(i) = fwd(li.intValue)
          pq.add(dist(i), i)
        }
      }
      i += 1
    }
    while (!pq.isEmpty) {
      val d = pq.topDist; val v = pq.topNode
      pq.removeTop()
      if (d == dist(v) && d < best) {
        if (overlay.tiles(v) == td) {
          val li = tileD.index.get(overlay.ids(v))
          if (li != null && bwd(li.intValue) != Long.MaxValue && d + bwd(li.intValue) < best) {
            best = d + bwd(li.intValue); bestV = v
          }
        }
        var e = overlay.off(v)
        while (e < overlay.off(v + 1)) {
          val nd = d + overlay.w(e)
          if (nd < dist(overlay.tgt(e))) {
            dist(overlay.tgt(e)) = nd
            par(overlay.tgt(e)) = v
            pq.add(nd, overlay.tgt(e))
          }
          e += 1
        }
      }
    }
    if (best == Long.MaxValue) return None

    val out = new scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    def emit(lat: Double, lon: Double): Unit =
      if (out.isEmpty || out.last != ((lat, lon))) out += ((lat, lon))
    // walk a parent array from `end` back to the search root, emit forward
    def chainOf(parents: Array[Int], end: Int): Array[Int] = {
      val buf = new scala.collection.mutable.ArrayBuffer[Int]()
      var x = end
      while (x != -1) { buf += x; x = parents(x) }
      buf.reverseIterator.toArray
    }

    if (bestV == -1) {
      // best path never leaves the shared tile
      chainOf(fPar, dL).foreach(j => emit(tileS.lat(j), tileS.lon(j)))
    } else {
      val ovChain = {
        val buf = new scala.collection.mutable.ArrayBuffer[Int]()
        var v = bestV
        while (v != -1) { buf += v; v = par(v) }
        buf.reverse
      }
      // source leg: sL -> first boundary node, inside the source tile
      val b1L = tileS.index.get(overlay.ids(ovChain.head)).intValue
      chainOf(fPar, b1L).foreach(j => emit(tileS.lat(j), tileS.lon(j)))
      // overlay legs
      var prev = ovChain.head
      ovChain.iterator.drop(1).foreach { nxt =>
        if (overlay.tiles(prev) != overlay.tiles(nxt)) {
          // cross-tile original edge: one segment
          emit(overlay.lat(nxt), overlay.lon(nxt))
        } else {
          // within-tile boundary-pair distance: expand inside the tile
          val tl = tile(overlay.tiles(prev))
          val (_, p2) = tl.distancesWithParents(
            tl.index.get(overlay.ids(prev)).intValue, reverse = false)
          chainOf(p2, tl.index.get(overlay.ids(nxt)).intValue)
            .foreach(j => emit(tl.lat(j), tl.lon(j)))
        }
        prev = nxt
      }
      // target leg: last boundary node -> dL; the reverse-graph parent
      // chain from b2 reads out as the forward node sequence b2 .. dL
      var x = tileD.index.get(overlay.ids(ovChain.last)).intValue
      while (x != -1) { emit(tileD.lat(x), tileD.lon(x)); x = bPar(x) }
    }
    Some((best, out.toArray))
  }
}
