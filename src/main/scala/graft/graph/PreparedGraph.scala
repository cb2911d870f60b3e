package graft.graph

import graft.geo.Geo

/** Immutable, broadcast-friendly routing graph in CSR form plus a uniform-grid
  * spatial index over main-road nodes.
  *
  * This is the Spark analogue of the reference's process-global router state
  * `RoutingData {node_positions, fast_graph, spatial_index, adj_list}`
  * (reference: rust/src/lib.rs:147-153): instead of a mutex-guarded global
  * (src/travel_time_extension.cpp:26-30) it is an immutable value shipped to
  * executors with `SparkContext.broadcast`, so every task thread reads it
  * lock-free (the safety argument the reference itself proves with rayon
  * thread-local calculators, rust/src/lib.rs:498-533).
  *
  * Arrays, not objects: ~28 bytes/edge, so a 24.6M-edge Italy-class graph
  * (`ITALY.md:55-56`) is ~700 MB — still broadcastable; continental graphs
  * would partition by tile (documented future work, SURVEY §4.2).
  */
final class PreparedGraph(
    val nodeLat: Array[Double],
    val nodeLon: Array[Double],
    // forward CSR
    val offsets: Array[Int],
    val targets: Array[Int],
    val weightsMs: Array[Int],
    val distM: Array[Float],
    // reverse CSR (for bidirectional search)
    val rOffsets: Array[Int],
    val rTargets: Array[Int],
    val rWeightsMs: Array[Int],
    // snap index over main-road nodes
    val snapIndex: GridIndex
) extends Serializable {

  /** Optional contraction hierarchy, built driver-side before broadcast
    * (reference: `fast_paths::prepare`, rust/src/lib.rs:260). Point queries
    * use it when present; serialized with the graph so executors share the
    * one prepared structure.
    */
  @volatile var ch: graft.algo.ChGraph = null

  /** Build + attach the CH (idempotent). Returns this for chaining.
    *
    * Practical bound: the parallel nested-dissection contraction (see
    * ContractionHierarchy.build) builds a 10k-node LATTICE in ~4 s and a
    * 40k lattice in ~13 s on 32 cores (lattices are the worst case —
    * degree 4 everywhere; road networks average ~2.6 and build several
    * times faster). The default gate keeps silent load-time builds to tens
    * of seconds; larger graphs route exactly via bidirectional Dijkstra,
    * or call withCh(higherCap) explicitly. The built CH persists beside
    * the parquet graph cache (ChStore; the reference persists its prepared
    * fast_paths graph the same way, rust/src/lib.rs:164-166), so the build
    * is paid once per graph, not per load.
    */
  def withCh(maxNodes: Int = 100000): PreparedGraph = {
    if (ch == null && numNodes <= maxNodes)
      ch = graft.algo.ContractionHierarchy.build(this)
    this
  }

  def numNodes: Int = nodeLat.length
  def numEdges: Int = targets.length

  /** Nearest main-road node to (lat, lon) within the search cutoff; -1 if
    * the graph is empty or the nearest node is beyond it. The cutoff is
    * Valhalla loki's default search radius posture the reference tests pin:
    * a point far off the network (POINT(0 0) from 35+ km away) must yield
    * NULL, not a clamp to the nearest corner
    * (test/sql/travel_time.test "invalid coordinates should return NULL").
    */
  def snap(lat: Double, lon: Double): Int = {
    val i = snapIndex.nearest(lat, lon)
    if (i < 0) i
    else if (Geo.haversineM(lat, lon, nodeLat(i), nodeLon(i)) > PreparedGraph.SnapCutoffM) -1
    else i
  }

  def snapWithDistance(lat: Double, lon: Double): Option[(Int, Double)] = {
    val idx = snap(lat, lon)
    if (idx < 0) None
    else Some((idx, Geo.haversineM(lat, lon, nodeLat(idx), nodeLon(idx))))
  }
}

object PreparedGraph {
  /** Max snap distance in meters (Valhalla loki's default search posture). */
  final val SnapCutoffM: Double = 35000.0
}

/** Uniform grid over (lat, lon) with ring-expansion nearest-neighbor search.
  * Plays the role of the reference's R-tree (rust/src/lib.rs:121-142,261).
  * O(1) expected lookup for uniformly dense road networks; serializable and
  * compact (two int arrays), which an off-the-shelf R-tree is not.
  */
final class GridIndex private (
    val minLat: Double,
    val minLon: Double,
    val cellSize: Double,
    val nLat: Int,
    val nLon: Int,
    // CSR over cells: cellStart(c)..cellStart(c+1) indexes into pointIds
    val cellStart: Array[Int],
    val pointIds: Array[Int],
    val lats: Array[Double],
    val lons: Array[Double]
) extends Serializable {

  private def cellOf(lat: Double, lon: Double): (Int, Int) = {
    val ci = math.min(nLat - 1, math.max(0, ((lat - minLat) / cellSize).toInt))
    val cj = math.min(nLon - 1, math.max(0, ((lon - minLon) / cellSize).toInt))
    (ci, cj)
  }

  /** Id (into the original node numbering) of the nearest indexed point.
    * Scans square rings outward; terminates when every unscanned ring is
    * provably farther than the current best: a cell at Chebyshev ring r is at
    * least (r-1)·cellSize away in raw degrees, scaled by cos(lat) in the
    * worst (longitude) axis — compare against that lower bound in the same
    * equirectangular metric `approxDist2` uses.
    */
  def nearest(lat: Double, lon: Double): Int = {
    if (pointIds.isEmpty) return -1
    val (ci, cj) = cellOf(lat, lon)
    var best = -1
    var bestD = Double.MaxValue
    var ring = 0
    val axisScale = math.min(1.0, math.max(0.01, math.cos(math.toRadians(lat))))
    val maxRing = math.max(nLat, nLon)
    var stopRing = Int.MaxValue
    while (ring <= math.min(maxRing, stopRing)) {
      var i = math.max(0, ci - ring)
      val iMax = math.min(nLat - 1, ci + ring)
      while (i <= iMax) {
        var j = math.max(0, cj - ring)
        val jMax = math.min(nLon - 1, cj + ring)
        while (j <= jMax) {
          if (i == ci - ring || i == ci + ring || j == cj - ring || j == cj + ring) {
            val c = i * nLon + j
            var k = cellStart(c)
            val kEnd = cellStart(c + 1)
            while (k < kEnd) {
              val d = Geo.approxDist2(lat, lon, lats(k), lons(k))
              if (d < bestD) { bestD = d; best = pointIds(k) }
              k += 1
            }
          }
          j += 1
        }
        i += 1
      }
      if (best >= 0) {
        // smallest possible squared distance to a cell at ring r+1
        val lb = ring.toDouble * cellSize * axisScale
        if (lb * lb > bestD) stopRing = ring // no farther ring can win
      }
      ring += 1
    }
    best
  }
}

object GridIndex {
  /** Build from main-road node positions. `ids` map positions back to node
    * indices in the parent graph.
    */
  def build(ids: Array[Int], lats: Array[Double], lons: Array[Double],
            targetCellDeg: Double = 0.005): GridIndex = {
    if (ids.isEmpty)
      return new GridIndex(0, 0, 1.0, 1, 1, Array(0, 0), Array.empty, Array.empty, Array.empty)
    val minLat = lats.min; val maxLat = lats.max
    val minLon = lons.min; val maxLon = lons.max
    val span = math.max(1e-9, math.max(maxLat - minLat, maxLon - minLon))
    val cell = math.max(targetCellDeg, span / 512) // cap grid at 512x512
    val nLat = math.max(1, math.ceil((maxLat - minLat) / cell).toInt + 1)
    val nLon = math.max(1, math.ceil((maxLon - minLon) / cell).toInt + 1)
    val nCells = nLat * nLon
    val counts = new Array[Int](nCells + 1)
    val cellIdx = new Array[Int](ids.length)
    var i = 0
    while (i < ids.length) {
      val ci = math.min(nLat - 1, math.max(0, ((lats(i) - minLat) / cell).toInt))
      val cj = math.min(nLon - 1, math.max(0, ((lons(i) - minLon) / cell).toInt))
      val c = ci * nLon + cj
      cellIdx(i) = c
      counts(c + 1) += 1
      i += 1
    }
    i = 0
    while (i < nCells) { counts(i + 1) += counts(i); i += 1 }
    val start = counts.clone()
    val outIds = new Array[Int](ids.length)
    val outLats = new Array[Double](ids.length)
    val outLons = new Array[Double](ids.length)
    val cursor = start.clone()
    i = 0
    while (i < ids.length) {
      val c = cellIdx(i)
      val pos = cursor(c)
      outIds(pos) = ids(i); outLats(pos) = lats(i); outLons(pos) = lons(i)
      cursor(c) += 1
      i += 1
    }
    new GridIndex(minLat, minLon, cell, nLat, nLon, start, outIds, outLats, outLons)
  }
}
