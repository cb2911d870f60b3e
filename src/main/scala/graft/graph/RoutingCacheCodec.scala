package graft.graph

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decoder for the reference engine's prebuilt routing cache
  * (`<pbf>.<mode>.routing`) — the only real-road-network artifact the
  * reference ships (`test/data/monaco.osm.pbf.auto.routing`).
  *
  * The file is bincode-1.3 (little-endian, fixed-width ints, `usize` as
  * u64, `Vec` length-prefixed with u64, enum tags as u32) of
  * `RoutingData` (reference `rust/src/lib.rs:147-153`):
  *
  * {{{
  * struct RoutingData {
  *   node_positions: Vec<(f64 /*lon*/, f64 /*lat*/)>,     // lib.rs:226-233
  *   fast_graph: FastGraph,                               // fast_paths 1.0
  *   spatial_index: RTree<IndexedPoint>,                  // rstar 0.12
  *   adj_list: Vec<Vec<(usize /*to*/, u32 /*ms*/)>>,      // lib.rs:144,247-257
  * }
  * }}}
  *
  * `FastGraph` (fast_paths 1.0 `src/fast_graph.rs`) is
  * `{num_nodes: usize, ranks: Vec<usize>, edges_fwd: Vec<FastGraphEdge>,
  * first_edge_ids_fwd: Vec<usize>, edges_bwd, first_edge_ids_bwd}` with
  * `FastGraphEdge` = five u64s; we skip it — the engine rebuilds its own
  * contraction hierarchy from the plain adjacency list. The `RTree`
  * (rstar 0.12: `{root: ParentNode, size: usize}`, `ParentNode =
  * {children: Vec<RTreeNode>, envelope: AABB[lower,upper: [f64;2]]}`,
  * `RTreeNode` enum `0=Leaf(IndexedPoint{lon,lat,idx: u64}) | 1=Parent`)
  * is walked recursively because the reference only indexes MAIN-ROAD
  * nodes (`lib.rs:234-242`) — the leaf `idx` set recovers the
  * `main_road` flag our snap policy needs.
  *
  * Every section self-validates (lengths agree with `node_positions`,
  * the walk must consume the file exactly), so a layout drift fails
  * loudly instead of yielding a garbled graph.
  */
object RoutingCacheCodec {

  final case class DecodedGraph(
      lon: Array[Double],
      lat: Array[Double],
      mainRoad: Array[Boolean],
      adjTo: Array[Array[Int]],
      adjWeightMs: Array[Array[Int]]) {
    def numNodes: Int = lon.length
    def numEdges: Int = adjTo.iterator.map(_.length).sum
  }

  def decode(path: String): DecodedGraph = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val buf = ch.map(FileChannel.MapMode.READ_ONLY, 0, ch.size())
      buf.order(ByteOrder.LITTLE_ENDIAN)

      def u64(): Long = buf.getLong()
      def u64i(what: String): Int = {
        val v = u64()
        require(v >= 0 && v <= Int.MaxValue, s"$what out of range: $v")
        v.toInt
      }

      // node_positions: Vec<(lon, lat)>
      val n = u64i("node_positions len")
      val lon = new Array[Double](n)
      val lat = new Array[Double](n)
      var i = 0
      while (i < n) { lon(i) = buf.getDouble(); lat(i) = buf.getDouble(); i += 1 }

      // fast_graph — validate the lengths, skip the payload
      val fgNodes = u64i("fast_graph.num_nodes")
      require(fgNodes == n, s"fast_graph.num_nodes $fgNodes != $n nodes")
      val ranks = u64i("ranks len")
      require(ranks == n, s"ranks len $ranks != $n")
      buf.position(buf.position() + 8 * ranks)
      var k = 0
      while (k < 2) { // fwd then bwd: edges (5×u64 each) + first_edge_ids
        val ne = u64i("edges len")
        buf.position(buf.position() + 40 * ne)
        val nf = u64i("first_edge_ids len")
        require(nf == n + 1, s"first_edge_ids len $nf != ${n + 1}")
        buf.position(buf.position() + 8 * nf)
        k += 1
      }

      // spatial_index: recover main-road node ids from the leaf idx set
      val mainRoad = new Array[Boolean](n)
      def walkParent(): Unit = {
        val nc = u64i("rtree children len")
        var c = 0
        while (c < nc) {
          buf.getInt() match {
            case 0 => // Leaf(IndexedPoint{lon, lat, idx})
              buf.position(buf.position() + 16)
              mainRoad(u64i("rtree leaf idx")) = true
            case 1 => walkParent()
            case t => throw new IllegalStateException(s"bad RTreeNode tag $t")
          }
          c += 1
        }
        buf.position(buf.position() + 32) // envelope AABB
      }
      walkParent()
      val rtreeSize = u64i("rtree size")
      require(rtreeSize <= n, s"rtree size $rtreeSize > $n")

      // adj_list: Vec<Vec<(to: u64, weight_ms: u32)>>
      val al = u64i("adj_list len")
      require(al == n, s"adj_list len $al != $n")
      val adjTo = new Array[Array[Int]](n)
      val adjW = new Array[Array[Int]](n)
      i = 0
      while (i < n) {
        val m = u64i("adj row len")
        val ts = new Array[Int](m)
        val ws = new Array[Int](m)
        var j = 0
        while (j < m) {
          ts(j) = u64i("adj to")
          ws(j) = buf.getInt()
          j += 1
        }
        adjTo(i) = ts; adjW(i) = ws
        i += 1
      }
      require(!buf.hasRemaining, s"${buf.remaining()} trailing bytes")
      DecodedGraph(lon, lat, mainRoad, adjTo, adjW)
    } finally ch.close()
  }

  /** The decoded graph as the engine's standard `(nodes, edges)` frames
    * (`GraphBuilder.prepare` schema). `dist_m` is re-derived as the
    * endpoint haversine — exactly how the reference computed the weight
    * in the first place (`rust/src/lib.rs:202-205`), so route distances
    * agree with its construction.
    */
  def toDataFrames(spark: SparkSession, g: DecodedGraph): (DataFrame, DataFrame) = {
    import spark.implicits._
    val nodes = (0 until g.numNodes).map(i => (i.toLong, g.lat(i), g.lon(i), g.mainRoad(i)))
    val edges = for {
      i <- 0 until g.numNodes
      j <- g.adjTo(i).indices
    } yield {
      val t = g.adjTo(i)(j)
      (i.toLong, t.toLong,
        graft.geo.Geo.haversineM(g.lat(i), g.lon(i), g.lat(t), g.lon(t)),
        g.adjWeightMs(i)(j).toLong)
    }
    (nodes.toDF("id", "lat", "lon", "main_road"),
      edges.toDF("src", "dst", "dist_m", "time_ms"))
  }
}
