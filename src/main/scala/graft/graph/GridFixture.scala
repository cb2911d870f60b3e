package graft.graph

import graft.geo.Geo

/** Deterministic synthetic road network: a k×k lattice with ~1 km spacing,
  * all `residential` (auto 30 km/h), plus a `motorway` diagonal corridor and
  * a few oneway edges — hand-checkable goldens for routing tests (FIXTURES.md
  * §1.2; the reference only gets invariant assertions on real data,
  * test/sql/monaco_routing.test:22-31).
  *
  * Node (i, j) has id i*k + j, at lat0 + i*spacing, lon0 + j*spacing.
  */
object GridFixture {
  final val K = 10
  final val Lat0 = 43.70
  final val Lon0 = 7.40
  final val SpacingDeg = 0.009 // ~1 km in latitude

  final case class Edge(src: Int, dst: Int, highway: String, oneway: Boolean)

  def nodeId(i: Int, j: Int): Int = i * K + j
  def latOf(id: Int): Double = Lat0 + (id / K) * SpacingDeg
  def lonOf(id: Int): Double = Lon0 + (id % K) * SpacingDeg

  /** Lattice edges: right + up neighbors (bidirectional unless oneway),
    * motorway along the main diagonal, and the top row eastbound-only.
    */
  def edges: Seq[Edge] = {
    val b = Seq.newBuilder[Edge]
    for (i <- 0 until K; j <- 0 until K) {
      val id = nodeId(i, j)
      if (j + 1 < K) { // east
        val oneway = i == K - 1 // top row: oneway eastbound
        b += Edge(id, nodeId(i, j + 1), "residential", oneway)
      }
      if (i + 1 < K) // north
        b += Edge(id, nodeId(i + 1, j), "residential", oneway = false)
      if (i + 1 < K && j + 1 < K && i == j) // diagonal motorway corridor
        b += Edge(id, nodeId(i + 1, j + 1), "motorway", oneway = false)
    }
    b.result()
  }

  /** Build the prepared graph for a mode directly (no Spark needed). */
  def prepared(mode: String = "auto"): PreparedGraph = {
    val n = K * K
    val lat = Array.tabulate(n)(latOf)
    val lon = Array.tabulate(n)(lonOf)
    val main = Array.fill(n)(true) // residential+motorway are all main roads
    val list = edges.flatMap { e =>
      SpeedModel.speedKmh(e.highway, mode).toSeq.flatMap { sp =>
        val d = Geo.haversineM(lat(e.src), lon(e.src), lat(e.dst), lon(e.dst))
        val t = SpeedModel.timeMs(d, sp)
        if (t <= 0) Nil
        else {
          val fwd = (e.src, e.dst, d, t)
          if (e.oneway) Seq(fwd) else Seq(fwd, (e.dst, e.src, d, t))
        }
      }
    }.toArray
    GraphBuilder.buildCsr(n, lat, lon, main, list)
  }

  /** Generic k×k all-residential lattice (bidirectional, ~900 m E-W / 1 km
    * N-S hops) for scale benchmarks — row-major ids like the main fixture.
    */
  def lattice(k: Int): PreparedGraph = {
    val n = k * k
    val lat = Array.tabulate(n)(i => Lat0 + (i / k) * SpacingDeg)
    val lon = Array.tabulate(n)(i => Lon0 + (i % k) * SpacingDeg)
    val es = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Long)]
    var i = 0
    while (i < k) {
      var j = 0
      while (j < k) {
        val id = i * k + j
        if (j + 1 < k) {
          val d = Geo.haversineM(lat(id), lon(id), lat(id + 1), lon(id + 1))
          val t = SpeedModel.timeMs(d, 30.0)
          es += ((id, id + 1, d, t)); es += ((id + 1, id, d, t))
        }
        if (i + 1 < k) {
          val d = Geo.haversineM(lat(id), lon(id), lat(id + k), lon(id + k))
          val t = SpeedModel.timeMs(d, 30.0)
          es += ((id, id + k, d, t)); es += ((id + k, id, d, t))
        }
        j += 1
      }
      i += 1
    }
    GraphBuilder.buildCsr(n, lat, lon, Array.fill(n)(true), es.toArray)
  }

  /** 100×100 lattice (10k nodes) with its CH, built once per JVM — the
    * throughput-bench graph. Batch point queries ride the hierarchy
    * (~6× over bidirectional Dijkstra at this size).
    */
  lazy val lattice100: PreparedGraph = lattice(100).withCh()

  /** The fixture as (nodes, edges) DataFrames matching FIXTURES.md §1.1. */
  def dataFrames(spark: org.apache.spark.sql.SparkSession, mode: String = "auto")
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val n = K * K
    val nodes = (0 until n).map(id => (id.toLong, latOf(id), lonOf(id), true))
      .toDF("id", "lat", "lon", "main_road")
    val es = edges.flatMap { e =>
      SpeedModel.speedKmh(e.highway, mode).toSeq.flatMap { sp =>
        val d = Geo.haversineM(latOf(e.src), lonOf(e.src), latOf(e.dst), lonOf(e.dst))
        val t = SpeedModel.timeMs(d, sp)
        if (t <= 0) Nil
        else {
          val fwd = (e.src.toLong, e.dst.toLong, e.highway, d, t)
          if (e.oneway) Seq(fwd)
          else Seq(fwd, (e.dst.toLong, e.src.toLong, e.highway, d, t))
        }
      }
    }.toDF("src", "dst", "highway", "dist_m", "time_ms")
    (nodes, es)
  }
}
