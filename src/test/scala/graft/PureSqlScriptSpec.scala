package graft

import java.nio.file.{Files, Paths}

import graft.graph.{GridFixture, OsmPbf, OsmPbfWriter}
import graft.plans.Qualify
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The reference's complete pure-SQL workflow script
  * (examples/monaco_pure_sql.sql) runs TOP TO BOTTOM through Qualify.sql —
  * INSTALL/LOAD, valhalla_build_tiles from a PBF, SET valhalla_tiles (the
  * write callback loads eagerly), CREATE MACRO + struct_pack, routing
  * CTEs, the json_object/::JSON GeoJSON COPY export, multi-route UNION and
  * multi-modal bonus sections. The only edits are data locations: the
  * Geofabrik URL becomes the grid-fixture PBF (zero-egress environment)
  * and the two output paths move into a scratch dir.
  */
class PureSqlScriptSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("monaco_pure_sql.sql runs statement-by-statement, verbatim") {
    val dir = Files.createTempDirectory("graft-puresql").toString

    // the "Monaco download": the grid fixture as a real OSM PBF
    val nodes = (0 until GridFixture.K * GridFixture.K).map(i =>
      OsmPbf.OsmNode(1000L + i, GridFixture.latOf(i), GridFixture.lonOf(i)))
    val ways = GridFixture.edges.zipWithIndex.map { case (e, i) =>
      val tags = Map("highway" -> e.highway) ++
        (if (e.oneway) Map("oneway" -> "yes") else Map.empty)
      (5000L + i, tags, Seq(1000L + e.src, 1000L + e.dst))
    }.toSeq
    val pbfPath = s"$dir/monaco-latest.osm.pbf"
    OsmPbfWriter.write(pbfPath, nodes, ways)

    val script = new String(
      Files.readAllBytes(Paths.get("/root/reference/examples/monaco_pure_sql.sql")),
      java.nio.charset.StandardCharsets.UTF_8)
      .replace("https://download.geofabrik.de/europe/monaco-latest.osm.pbf", pbfPath)
      .replace("./monaco_tiles", s"$dir/monaco_tiles")
      .replace("'monaco_route.geojson'", s"'$dir/monaco_route.geojson'")

    val statements = Qualify.splitStatements(script)
    assert(statements.length > 20, s"split found only ${statements.length} statements")

    val prevMacro = Qualify.macrosOf(spark).get("travel_time_route")
    try {
      val results = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Row])]
      statements.foreach { stmt =>
        val rows =
          try Qualify.sql(spark, stmt).collect()
          catch {
            case e: Exception =>
              fail(s"statement failed:\n$stmt\n→ ${e.getMessage.take(400)}", e)
          }
        results += ((stmt, rows))
      }

      // Step 5: the Casino → Museum route row
      val routeRow = results.collectFirst {
        case (stmt, rows) if stmt.contains("duration_seconds") => rows.head
      }.get
      assert(routeRow.getDouble(routeRow.fieldIndex("distance_km")) > 0.1)
      assert(routeRow.getDouble(routeRow.fieldIndex("duration_minutes")) > 0.0)
      // one lattice edge between the snapped endpoints on the grid fixture
      assert(routeRow.getInt(routeRow.fieldIndex("waypoints")) >= 2)

      // Step 6: the exported GeoJSON file
      val geo = new String(
        Files.readAllBytes(Paths.get(s"$dir/monaco_route.geojson")),
        java.nio.charset.StandardCharsets.UTF_8).trim
      assert(geo.startsWith("""{"type":"FeatureCollection","features":[{"type":"Feature""""))
      assert(geo.contains(""""geometry":{"type":"LineString","coordinates":["""))

      // Bonus: three named routes ordered by km
      val bonus = results.collectFirst {
        case (stmt, rows) if stmt.contains("Station") => rows
      }.get
      assert(bonus.length == 3)
      val kms = bonus.map(r => r.getDouble(r.fieldIndex("km")))
      assert(kms.sorted.sameElements(kms))

      // Bonus: three travel modes ordered by minutes, car fastest
      val modes = results.collectFirst {
        case (stmt, rows) if stmt.contains("kmh") => rows
      }.get
      assert(modes.length == 3)
      val mins = modes.map(r => r.getDouble(r.fieldIndex("min")))
      assert(mins.sorted.sameElements(mins))
      assert(modes.head.getString(modes.head.fieldIndex("mode")).contains("Car"))
    } finally {
      // the script's CREATE MACRO shadows the travel_time_route built-in for
      // Qualify.sql call sites; restore the shared session for other specs
      prevMacro match {
        case Some(m) => Qualify.registerMacro(spark, m)
        case None => Qualify.unregisterMacro(spark, "travel_time_route")
      }
      graft.queries.Routing.ensure(spark)
    }
  }
}
