package graft

import graft.geo.Wkb
import graft.graph.GridFixture
import graft.queries.Routing
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end SQL-surface assertions — Scala ports of the reference's
  * SQLLogicTest cases (test/sql/travel_time.test registration checks;
  * test/sql/monaco_routing.test behavioral invariants) against the grid
  * fixture through the registered functions.
  */
class SparkRoutingSpec extends AnyFunSuite {

  private lazy val spark = { val s = SparkTestBase.spark; Routing.ensure(s); s }

  private def one(sql: String): Row = { spark.sql(sql).collect().head }

  test("registration: every travel_time* function resolves (travel_time.test:14-48)") {
    Seq(
      "SELECT travel_time_is_loaded()",
      "SELECT travel_time(43.7, 7.4, 43.745, 7.445, 'auto')",
      "SELECT travel_time_node_count('auto')",
      "SELECT travel_time_locate(43.7, 7.4, 'auto')",
      "SELECT travel_time_snap(43.7, 7.4, 'auto')",
      "SELECT travel_time_route('POINT(7.4 43.7)', 'POINT(7.42 43.72)', 'auto')",
      "SELECT travel_time_matrix(array(43.7), array(7.4), array(43.72), array(7.42), 'auto')",
      "SELECT travel_time_isochrone(43.7, 7.4, 120.0, 'auto')",
      "SELECT travel_time_request('status', '{}')"
    ).foreach(q => assert(spark.sql(q).collect().nonEmpty, q))
  }

  test("loaded state and node count") {
    assert(one("SELECT travel_time_is_loaded() AS x").getBoolean(0))
    assert(one("SELECT travel_time_node_count('auto') AS n").getInt(0) == 100)
  }

  test("route: distance and duration positive, geometry decodes to LINESTRING " +
    "with >2 waypoints (monaco_routing.test:22-31,55-69)") {
    val r = one("""SELECT travel_time_route('POINT(7.4 43.7)', 'POINT(7.481 43.781)', 'auto') AS r""")
      .getStruct(0)
    assert(r.getDouble(0) > 0)     // distance_km
    assert(r.getDouble(1) > 0)     // duration_minutes
    val pts = Wkb.readLineString(r.getAs[Array[Byte]](2)).get
    assert(pts.length > 2)
  }

  test("WKT and WKB inputs give identical results (monaco_routing.test:33-47)") {
    val viaWkt = one(
      """SELECT travel_time_route('POINT(7.4 43.7)', 'POINT(7.44 43.74)', 'auto') AS r""").getStruct(0)
    val viaWkb = one(
      """SELECT travel_time_route_wkb(st_point(7.4, 43.7), st_point(7.44, 43.74), 'auto') AS r""").getStruct(0)
    assert(viaWkt.getDouble(0) == viaWkb.getDouble(0))
    assert(viaWkt.getDouble(1) == viaWkb.getDouble(1))
    assert(java.util.Arrays.equals(viaWkt.getAs[Array[Byte]](2), viaWkb.getAs[Array[Byte]](2)))
  }

  test("NULL inputs produce NULL, not errors (src/travel_time_extension.cpp:636-639)") {
    assert(one("SELECT travel_time(NULL, 7.4, 43.74, 7.44, 'auto') AS t").isNullAt(0))
    assert(one("SELECT travel_time_route(NULL, 'POINT(7.4 43.7)', 'auto') AS r").isNullAt(0))
    assert(one("SELECT travel_time_route('garbage wkt', 'POINT(7.4 43.7)', 'auto') AS r").isNullAt(0))
  }

  test("unknown costing throws IllegalStateException (src/travel_time_extension.cpp:38-42)") {
    val e = intercept[Exception] {
      spark.sql("SELECT travel_time(43.7, 7.4, 43.74, 7.44, 'hovercraft')").collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[IllegalStateException]))
  }

  test("matrix SQL: N×M rows, from/to indices complete (monaco_routing.test:107-124)") {
    val rows = spark.sql(
      """SELECT m.* FROM (SELECT explode(travel_time_matrix(
        |  array(43.7, 43.745), array(7.4, 7.445),
        |  array(43.781, 43.7), array(7.481, 7.44), 'auto')) AS m)""".stripMargin).collect()
    assert(rows.length == 4) // 2x2 (z_integration.test.skip:43-53)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((0, 0), (0, 1), (1, 0), (1, 1)))
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0) // all reachable on the fixture
    }
  }

  test("matrix diagonal zero when source == destination") {
    val r = one("""SELECT explode(travel_time_matrix(
      |  array(43.7), array(7.4), array(43.7), array(7.4), 'auto')) AS m""".stripMargin)
      .getStruct(0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("locate snaps into lattice bounding box (monaco_routing.test:96-105)") {
    val p = one("SELECT travel_time_locate(43.733, 7.427, 'auto') AS p").getStruct(0)
    val lat = p.getDouble(0); val lon = p.getDouble(1)
    assert(lat >= GridFixture.Lat0 && lat <= GridFixture.Lat0 + 9 * GridFixture.SpacingDeg)
    assert(lon >= GridFixture.Lon0 && lon <= GridFixture.Lon0 + 9 * GridFixture.SpacingDeg)
  }

  test("request API: status + route JSON round-trip (wrapper.cpp:182-223 shape)") {
    val status = one("SELECT travel_time_request('status', '{}') AS s").getString(0)
    assert(status.contains("\"has_tiles\":true"))
    val route = one(
      s"""SELECT travel_time_request('route',
         |  '{"locations": [{"lat": 43.7, "lon": 7.4}, {"lat": 43.781, "lon": 7.481}],
         |    "costing": "auto"}') AS r""".stripMargin).getString(0)
    assert(route.contains("\"trip\""))
    val shape = one(s"""SELECT get_json_object('$route', '$$.trip.legs[0].shape') AS s""")
    assert(shape.getString(0).nonEmpty)
    val err = one("SELECT travel_time_request('teleport', '{}') AS e").getString(0)
    assert(err.contains("\"error\""))
  }

  test("macro equivalence: travel_time ≈ route duration (monaco_routing.test:132-160)") {
    val t = one("SELECT travel_time(43.7, 7.4, 43.781, 7.481, 'auto') AS t").getDouble(0)
    val r = one("SELECT travel_time_route('POINT(7.4 43.7)', 'POINT(7.481 43.781)', 'auto').duration_minutes AS m")
      .getDouble(0)
    assert(math.abs(t / 60.0 - r) < 0.01)
  }
}
