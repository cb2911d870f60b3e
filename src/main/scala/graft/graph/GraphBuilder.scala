package graft.graph

import graft.geo.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph construction: OSM-shaped inputs → per-mode weighted digraph.
  *
  * The ETL half is distributed Spark (runs on ways/nodes DataFrames of any
  * size); the final CSR assembly collects to the driver because the prepared
  * graph is broadcast whole, like the reference's in-process router
  * (reference: rust/src/lib.rs:168-269).
  */
object GraphBuilder {

  /** haversine as a Catalyst column expression (codegen'd, no UDF). */
  def haversineCol(lat1: org.apache.spark.sql.Column, lon1: org.apache.spark.sql.Column,
                   lat2: org.apache.spark.sql.Column, lon2: org.apache.spark.sql.Column) = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) + cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * Geo.MeanEarthRadiusM) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Distributed ETL: ways(way_id, highway, oneway, node_ids ARRAY<BIGINT>) +
    * rawNodes(id, lat, lon) → edges(src, dst, highway, dist_m, time_ms).
    *
    * Mirrors the reference's way→edge expansion (rust/src/lib.rs:168-232):
    * consecutive node pairs along each way, speed by (mode, highway), reverse
    * edge unless oneway, zero-time edges dropped.
    *
    * SHUFFLE-FREE pairing: consecutive (src, dst) hops come straight from
    * zipping the `node_ids` array against itself shifted by one — a
    * per-row expression. The round-1 `lead() OVER (PARTITION BY way_id)`
    * formulation shuffled every hop of every way just to see its neighbor,
    * which at planet scale is a full-data shuffle for information the
    * array row already holds.
    */
  def buildEdges(spark: SparkSession, ways: DataFrame, rawNodes: DataFrame, mode: String): DataFrame = {
    import spark.implicits._
    val speedRows = speedTable(mode)
    val speedDf = spark.createDataFrame(speedRows).toDF("highway", "speed_kmh")

    val pairs = ways
      .select($"way_id", $"highway", coalesce($"oneway", lit(false)).as("oneway"),
        explode(zip_with(
          slice($"node_ids", lit(1), greatest(size($"node_ids") - 1, lit(0))),
          slice($"node_ids", lit(2), greatest(size($"node_ids") - 1, lit(0))),
          (a, b) => struct(a.as("src"), b.as("dst")))).as("hop"))
      .select($"way_id", $"highway", $"oneway", $"hop.src", $"hop.dst")

    val n1 = rawNodes.select($"id".as("src"), $"lat".as("src_lat"), $"lon".as("src_lon"))
    val n2 = rawNodes.select($"id".as("dst"), $"lat".as("dst_lat"), $"lon".as("dst_lon"))
    val withCoords = pairs.join(n1, "src").join(n2, "dst")
      .join(broadcast(speedDf), Seq("highway"), "inner") // drops untraversable ways
      .withColumn("dist_m", haversineCol($"src_lat", $"src_lon", $"dst_lat", $"dst_lon"))
      .withColumn("time_ms", floor($"dist_m" / 1000.0 / $"speed_kmh" * 3600.0 * 1000.0))
      .filter($"time_ms" > 0)

    val fwd = withCoords.select($"src", $"dst", $"highway", $"dist_m", $"time_ms")
    val rev = withCoords.filter(!$"oneway")
      .select($"dst".as("src"), $"src".as("dst"), $"highway", $"dist_m", $"time_ms")
    fwd.unionByName(rev)
  }

  private def speedTable(mode: String): Seq[(String, Double)] = {
    val highways = Seq("motorway", "motorway_link", "trunk", "trunk_link", "primary",
      "primary_link", "secondary", "secondary_link", "tertiary", "tertiary_link",
      "residential", "living_street", "service", "unclassified", "cycleway", "path",
      "track", "bridleway", "footway", "pedestrian", "steps")
    highways.flatMap(h => SpeedModel.speedKmh(h, mode).map(h -> _))
  }

  /** Node positions actually used by `edges`, with main-road flag.
    * Membership test is `isin` (codegen'd, pushdown-friendly), not a UDF.
    */
  def usedNodes(spark: SparkSession, rawNodes: DataFrame, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val endpoints = edges.select($"src".as("id"), $"highway")
      .unionByName(edges.select($"dst".as("id"), $"highway"))
    // coalesce: isin(NULL) is NULL, not false — a node whose every incident
    // edge lacks a highway tag must classify non-main, not NULL (prepare()
    // reads the flag as a primitive boolean)
    val flags = endpoints
      .groupBy($"id")
      .agg(max(coalesce($"highway".isin(SpeedModel.MainRoads: _*), lit(false)))
        .as("main_road"))
    flags.join(rawNodes, "id").select($"id", $"lat", $"lon", $"main_road")
  }

  /** Collect nodes/edges DataFrames into an immutable CSR + snap index.
    *
    * nodes: (id BIGINT, lat DOUBLE, lon DOUBLE, main_road BOOLEAN)
    * edges: (src BIGINT, dst BIGINT, dist_m DOUBLE, time_ms BIGINT)
    *
    * COLUMNAR collect: each partition ships ONE tuple of primitive arrays,
    * not per-row `Row`s — driver memory is the CSR's own footprint (~44
    * bytes/edge transient), so an Italy-class graph (9.7M nodes / 24.6M
    * edges ≈ 1.3 GB of arrays) assembles comfortably where Row collect
    * (round 1) needed multi-GB of object overhead. Planet-class graphs
    * exceed any single broadcast — that path is tile partitioning, see
    * SURVEY §9.
    */
  def prepare(nodes: DataFrame, edges: DataFrame): PreparedGraph = {
    val nodeBatches = nodes
      .select(col("id").cast("long"), col("lat").cast("double"),
        col("lon").cast("double"), col("main_road").cast("boolean"))
      .rdd.mapPartitions { it =>
        val ids = scala.collection.mutable.ArrayBuilder.make[Long]
        val lats = scala.collection.mutable.ArrayBuilder.make[Double]
        val lons = scala.collection.mutable.ArrayBuilder.make[Double]
        val mains = scala.collection.mutable.ArrayBuilder.make[Boolean]
        it.foreach { r =>
          ids += r.getLong(0); lats += r.getDouble(1)
          lons += r.getDouble(2); mains += r.getBoolean(3)
        }
        Iterator.single((ids.result(), lats.result(), lons.result(), mains.result()))
      }.collect()
    val n = nodeBatches.iterator.map(_._1.length).sum
    val idToIdx = new java.util.HashMap[Long, Integer](n * 2)
    val lat = new Array[Double](n); val lon = new Array[Double](n)
    val main = new Array[Boolean](n)
    var i = 0
    nodeBatches.foreach { case (ids, lats, lons, mains) =>
      var j = 0
      while (j < ids.length) {
        idToIdx.put(ids(j), i)
        lat(i) = lats(j); lon(i) = lons(j); main(i) = mains(j)
        i += 1; j += 1
      }
    }
    val edgeBatches = edges
      .select(col("src").cast("long"), col("dst").cast("long"),
        col("dist_m").cast("double"), col("time_ms").cast("long"))
      .rdd.mapPartitions { it =>
        val srcs = scala.collection.mutable.ArrayBuilder.make[Long]
        val dsts = scala.collection.mutable.ArrayBuilder.make[Long]
        val dms = scala.collection.mutable.ArrayBuilder.make[Double]
        val tms = scala.collection.mutable.ArrayBuilder.make[Long]
        it.foreach { r =>
          srcs += r.getLong(0); dsts += r.getLong(1)
          dms += r.getDouble(2); tms += r.getLong(3)
        }
        Iterator.single((srcs.result(), dsts.result(), dms.result(), tms.result()))
      }.collect()
    val mTotal = edgeBatches.iterator.map(_._1.length).sum
    val srcIdx = new Array[Int](mTotal); val dstIdx = new Array[Int](mTotal)
    val distM = new Array[Double](mTotal); val timeMs = new Array[Long](mTotal)
    var m = 0
    edgeBatches.foreach { case (srcs, dsts, dms, tms) =>
      var j = 0
      while (j < srcs.length) {
        val s = idToIdx.get(srcs(j)); val d = idToIdx.get(dsts(j))
        if (s != null && d != null) { // endpoints missing from nodes: drop edge
          srcIdx(m) = s.intValue; dstIdx(m) = d.intValue
          distM(m) = dms(j); timeMs(m) = tms(j)
          m += 1
        }
        j += 1
      }
    }
    buildCsrArrays(n, lat, lon, main, m, srcIdx, dstIdx, distM, timeMs)
  }

  /** Pure assembly from dense-indexed edge tuples (src, dst, distM, timeMs) —
    * test/fixture convenience over [[buildCsrArrays]].
    */
  def buildCsr(n: Int, lat: Array[Double], lon: Array[Double], main: Array[Boolean],
               edges: Array[(Int, Int, Double, Long)]): PreparedGraph =
    buildCsrArrays(n, lat, lon, main, edges.length,
      edges.map(_._1), edges.map(_._2), edges.map(_._3), edges.map(_._4))

  /** Primitive-array CSR assembly: no per-edge objects anywhere on the
    * driver. Only the first `m` entries of each edge array are read.
    */
  def buildCsrArrays(n: Int, lat: Array[Double], lon: Array[Double], main: Array[Boolean],
                     m: Int, srcIdx: Array[Int], dstIdx: Array[Int],
                     distM: Array[Double], timeMs: Array[Long]): PreparedGraph = {
    val off = new Array[Int](n + 1)
    var e = 0
    while (e < m) { off(srcIdx(e) + 1) += 1; e += 1 }
    var i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val tgt = new Array[Int](m); val wMs = new Array[Int](m); val dM = new Array[Float](m)
    val cur = off.clone()
    e = 0
    while (e < m) {
      val p = cur(srcIdx(e)); cur(srcIdx(e)) += 1
      tgt(p) = dstIdx(e); wMs(p) = math.min(timeMs(e), Int.MaxValue).toInt
      dM(p) = distM(e).toFloat
      e += 1
    }
    // reverse CSR
    val rOff = new Array[Int](n + 1)
    e = 0
    while (e < m) { rOff(dstIdx(e) + 1) += 1; e += 1 }
    i = 0
    while (i < n) { rOff(i + 1) += rOff(i); i += 1 }
    val rTgt = new Array[Int](m); val rW = new Array[Int](m)
    val rCur = rOff.clone()
    e = 0
    while (e < m) {
      val p = rCur(dstIdx(e)); rCur(dstIdx(e)) += 1
      rTgt(p) = srcIdx(e); rW(p) = math.min(timeMs(e), Int.MaxValue).toInt
      e += 1
    }
    // snap index over main-road nodes only (rust/src/lib.rs:233-241)
    val mainIdx = (0 until n).filter(main(_)).toArray
    val idx = GridIndex.build(mainIdx, mainIdx.map(lat(_)), mainIdx.map(lon(_)))
    new PreparedGraph(lat, lon, off, tgt, wMs, dM, rOff, rTgt, rW, idx)
  }
}
