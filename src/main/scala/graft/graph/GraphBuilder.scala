package graft.graph

import graft.geo.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    */
  def buildEdges(spark: SparkSession, ways: DataFrame, rawNodes: DataFrame, mode: String): DataFrame = {
    import spark.implicits._
    val speedRows = speedTable(mode)
    val speedDf = spark.createDataFrame(speedRows).toDF("highway", "speed_kmh")

    val hops = ways
      .select($"way_id", $"highway", coalesce($"oneway", lit(false)).as("oneway"),
        posexplode($"node_ids").as(Seq("pos", "node_id")))
    val w = Window.partitionBy($"way_id").orderBy($"pos")
    val pairs = hops
      .withColumn("next_id", lead($"node_id", 1).over(w))
      .filter($"next_id".isNotNull)
      .select($"way_id", $"highway", $"oneway", $"node_id".as("src"), $"next_id".as("dst"))

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

  /** Node positions actually used by `edges`, with main-road flag. */
  def usedNodes(spark: SparkSession, rawNodes: DataFrame, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val endpoints = edges.select($"src".as("id"), $"highway")
      .unionByName(edges.select($"dst".as("id"), $"highway"))
    val mainRoadUdf = udf((h: String) => SpeedModel.isMainRoad(h))
    val flags = endpoints
      .groupBy($"id").agg(max(mainRoadUdf($"highway")).as("main_road"))
    flags.join(rawNodes, "id").select($"id", $"lat", $"lon", $"main_road")
  }

  /** Collect nodes/edges DataFrames into an immutable CSR + snap index.
    *
    * nodes: (id BIGINT, lat DOUBLE, lon DOUBLE, main_road BOOLEAN)
    * edges: (src BIGINT, dst BIGINT, dist_m DOUBLE, time_ms BIGINT)
    */
  def prepare(nodes: DataFrame, edges: DataFrame): PreparedGraph = {
    val nodeRows = nodes.select("id", "lat", "lon", "main_road").collect()
    val n = nodeRows.length
    val idToIdx = new java.util.HashMap[Long, Integer](n * 2)
    val lat = new Array[Double](n); val lon = new Array[Double](n)
    val main = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val r = nodeRows(i)
      idToIdx.put(r.getLong(0), i)
      lat(i) = r.getDouble(1); lon(i) = r.getDouble(2); main(i) = r.getBoolean(3)
      i += 1
    }
    val edgeRows = edges.select("src", "dst", "dist_m", "time_ms").collect()
    buildCsr(n, lat, lon, main, edgeRows.iterator.map { r =>
      val s = idToIdx.get(r.getLong(0)); val d = idToIdx.get(r.getLong(1))
      if (s == null || d == null) null
      else (s.intValue, d.intValue, r.getDouble(2), r.getLong(3))
    }.filter(_ != null).toArray)
  }

  /** Pure assembly from dense-indexed edge tuples (src, dst, distM, timeMs). */
  def buildCsr(n: Int, lat: Array[Double], lon: Array[Double], main: Array[Boolean],
               edges: Array[(Int, Int, Double, Long)]): PreparedGraph = {
    val m = edges.length
    val off = new Array[Int](n + 1)
    edges.foreach { e => off(e._1 + 1) += 1 }
    var i = 0
    while (i < n) { off(i + 1) += off(i); i += 1 }
    val tgt = new Array[Int](m); val wMs = new Array[Int](m); val dM = new Array[Float](m)
    val cur = off.clone()
    edges.foreach { case (s, d, dm, tms) =>
      val p = cur(s); cur(s) += 1
      tgt(p) = d; wMs(p) = math.min(tms, Int.MaxValue).toInt; dM(p) = dm.toFloat
    }
    // reverse CSR
    val rOff = new Array[Int](n + 1)
    edges.foreach { e => rOff(e._2 + 1) += 1 }
    i = 0
    while (i < n) { rOff(i + 1) += rOff(i); i += 1 }
    val rTgt = new Array[Int](m); val rW = new Array[Int](m)
    val rCur = rOff.clone()
    edges.foreach { case (s, d, _, tms) =>
      val p = rCur(d); rCur(d) += 1
      rTgt(p) = s; rW(p) = math.min(tms, Int.MaxValue).toInt
    }
    // snap index over main-road nodes only (rust/src/lib.rs:233-241)
    val mainIdx = (0 until n).filter(main(_)).toArray
    val idx = GridIndex.build(mainIdx, mainIdx.map(lat(_)), mainIdx.map(lon(_)))
    new PreparedGraph(lat, lon, off, tgt, wMs, dM, rOff, rTgt, rW, idx)
  }
}
