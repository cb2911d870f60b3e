package graft

import graft.graph.{GridFixture, OsmPbf, OsmPbfWriter, GraphStore}
import graft.routing.RoutingContext
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** OSM PBF codec round-trip + PBF → graph → route end-to-end
  * (the reference's `routing_load` ingestion path, rust/src/lib.rs:343-384).
  */
class OsmPbfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def gridAsOsm: (Seq[OsmPbf.OsmNode], Seq[(Long, Map[String, String], Seq[Long])]) = {
    val nodes = (0 until GridFixture.K * GridFixture.K).map(i =>
      OsmPbf.OsmNode(1000L + i, GridFixture.latOf(i), GridFixture.lonOf(i)))
    val ways = GridFixture.edges.zipWithIndex.map { case (e, i) =>
      val tags = Map("highway" -> e.highway) ++
        (if (e.oneway) Map("oneway" -> "yes") else Map.empty)
      (5000L + i, tags, Seq(1000L + e.src, 1000L + e.dst))
    }
    (nodes, ways.toSeq)
  }

  test("PBF encode/decode round-trip: dense nodes, tags, oneway, refs") {
    val (nodes, ways) = gridAsOsm
    val path = Files.createTempDirectory("pbf").resolve("grid.osm.pbf").toString
    OsmPbfWriter.write(path, nodes, ways)

    val blocks = OsmPbf.frame(path)
    assert(blocks.map(_.blobType) == Seq("OSMHeader", "OSMData"))
    val (decNodes, decWays) = OsmPbf.decodeBlock(blocks(1).payload)
    assert(decNodes.length == nodes.length)
    decNodes.zip(nodes).foreach { case (a, b) =>
      assert(a.id == b.id)
      assert(math.abs(a.lat - b.lat) < 1e-7 && math.abs(a.lon - b.lon) < 1e-7)
    }
    assert(decWays.length == ways.length) // all have highway tags
    val w0 = decWays.find(_.wayId == 5000L).get
    assert(w0.nodeIds == ways.head._3)
    assert(decWays.count(_.oneway) == ways.count(_._2.contains("oneway")))
    assert(decWays.map(_.highway).toSet == Set("residential", "motorway"))
  }

  test("PBF -> distributed graph build -> route end-to-end matches fixture routing") {
    val (nodes, ways) = gridAsOsm
    val dir = Files.createTempDirectory("pbf-e2e")
    val path = dir.resolve("grid.osm.pbf").toString
    OsmPbfWriter.write(path, nodes, ways)

    val h = RoutingContext.loadPbf(spark, path, Seq("auto"))
    val g = h.requireGraph("auto")
    assert(g.numNodes == 100)
    // route across the lattice equals the fixture-built graph's answer
    val viaPbf = spark.sql(
      s"""SELECT travel_time(${GridFixture.latOf(0)}, ${GridFixture.lonOf(0)},
         |${GridFixture.latOf(99)}, ${GridFixture.lonOf(99)}, 'auto') AS t""".stripMargin)
      .collect().head.getDouble(0)
    val fixture = GridFixture.prepared("auto")
    val want = new graft.algo.Dijkstra(fixture).shortestPathMs(0, 99) / 1000.0
    assert(math.abs(viaPbf - want) < 1.0, s"pbf=$viaPbf fixture=$want")

    // second load hits the parquet cache (config already present)
    assert(Files.exists(java.nio.file.Paths.get(s"$path.graft", GraphStore.ConfigName)))
    RoutingContext.unload()
    val h2 = RoutingContext.loadPbf(spark, path, Seq("auto"))
    assert(h2.requireGraph("auto").numNodes == 100)
  }

  test("DataSource V2: spark.read.format(osmpbf) matches the RDD decode path") {
    val (nodes, ways) = gridAsOsm
    val dir = Files.createTempDirectory("pbf-dsv2")
    val path = dir.resolve("grid.osm.pbf").toString
    OsmPbfWriter.write(path, nodes, ways)

    val dsNodes = spark.read.format(graft.sources.OsmPbfSource.Format)
      .option("kind", "nodes").load(path)
    assert(dsNodes.schema.fieldNames.toSeq == Seq("id", "lat", "lon"))
    assert(dsNodes.count() == nodes.length)
    val n37 = dsNodes.filter(org.apache.spark.sql.functions.col("id") === 1037L)
      .collect().head
    assert(math.abs(n37.getDouble(1) - GridFixture.latOf(37)) < 1e-7)

    val dsWays = spark.read.format(graft.sources.OsmPbfSource.Format)
      .option("kind", "ways").load(path)
    assert(dsWays.count() == ways.length)
    val w0 = dsWays.filter(org.apache.spark.sql.functions.col("way_id") === 5000L)
      .collect().head
    assert(w0.getAs[scala.collection.Seq[Long]]("node_ids") == ways.head._3)
    assert(dsWays.filter(org.apache.spark.sql.functions.col("oneway")).count() ==
      ways.count(_._2.contains("oneway")))

    // column pruning + pushdown-compatible: the DSv2 read slots into the
    // same ETL the RDD path feeds
    val edges = graft.graph.GraphBuilder.buildEdges(spark, dsWays, dsNodes, "auto")
    assert(edges.count() > 0)
  }

  test("remote PBF ingest over HTTP: frame via Hadoop FS, decode, build, route") {
    val (nodes, ways) = gridAsOsm
    val dir = Files.createTempDirectory("pbf-http")
    val local = dir.resolve("grid.osm.pbf")
    OsmPbfWriter.write(local.toString, nodes, ways)
    val bytes = Files.readAllBytes(local)

    // serve the fixture over real HTTP (JDK built-in server) — the remote
    // download path of the reference (valhalla_build_tiles_simple.cpp:180-198)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/grid.osm.pbf", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/grid.osm.pbf"
      val (rawNodes, rawWays) = OsmPbf.read(spark, url)
      assert(rawNodes.count() == nodes.length && rawWays.count() == ways.length)

      RoutingContext.unload()
      val h = RoutingContext.loadPbf(spark, url, Seq("auto"))
      assert(h.requireGraph("auto").numNodes == 100)
      val t = spark.sql(
        s"""SELECT travel_time(${GridFixture.latOf(0)}, ${GridFixture.lonOf(0)},
           |${GridFixture.latOf(99)}, ${GridFixture.lonOf(99)}, 'auto') AS t""".stripMargin)
        .collect().head.getDouble(0)
      assert(t > 0, s"route over http-ingested graph: $t")
    } finally server.stop(0)
  }

  // restore the grid fixture binding for suites that run after this one
  test("rebind grid fixture") {
    RoutingContext.unload()
    graft.queries.Routing.ensure(spark)
    assert(spark.sql("SELECT travel_time_is_loaded() AS x").collect().head.getBoolean(0))
  }
}
