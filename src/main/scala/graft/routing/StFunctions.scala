package graft.routing

import graft.geo.{Geo, Wkb, Wkt}
import org.apache.spark.sql.SparkSession

/** Minimal spatial shims over WKB BinaryType — enough to run every reference
  * example that combines routing with DuckDB-spatial functions
  * (ITALY.md:73-77,164-165,268-273; test/sql/monaco_routing.test:35-67).
  * WKB is the canonical geometry form, as in the reference
  * (src/travel_time_extension.cpp:902,906); Spark has no GEOMETRY type, so
  * `st_geomfromwkb`/`st_aswkb` are identities by design (SURVEY §7 risk 3).
  */
object StFunctions {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_point", (lon: Double, lat: Double) => Wkb.writePoint(lon, lat))
    spark.udf.register("st_geomfromwkb", (b: Array[Byte]) => b)
    spark.udf.register("st_aswkb", (b: Array[Byte]) => b)
    spark.udf.register("st_geomfromtext", (s: String) => wktToWkb(s))

    spark.udf.register("st_astext", (b: Array[Byte]) => asText(b))
    spark.udf.register("st_asgeojson", (b: Array[Byte]) => asGeoJson(b))

    spark.udf.register("st_x", (b: Array[Byte]) => Wkb.readPoint(b).map(_._1))
    spark.udf.register("st_y", (b: Array[Byte]) => Wkb.readPoint(b).map(_._2))

    spark.udf.register("st_npoints", (b: Array[Byte]) => nPoints(b))
    spark.udf.register("st_geometrytype", (b: Array[Byte]) => geomType(b))
    // the reference's tests spell it ST_GeomType (test/sql/monaco_routing.test:57,150)
    spark.udf.register("st_geomtype", (b: Array[Byte]) => geomType(b))

    spark.udf.register("st_startpoint", (b: Array[Byte]) =>
      Wkb.readLineString(b).flatMap(_.headOption).map(p => Wkb.writePoint(p._1, p._2)))
    spark.udf.register("st_endpoint", (b: Array[Byte]) =>
      Wkb.readLineString(b).flatMap(_.lastOption).map(p => Wkb.writePoint(p._1, p._2)))
    spark.udf.register("st_centroid", (b: Array[Byte]) =>
      Wkb.centroid(b).map(p => Wkb.writePoint(p._1, p._2)))

    // geodesic length in meters of a LINESTRING (0 for points)
    spark.udf.register("st_length_spheroid", (b: Array[Byte]) => lengthM(b))
    // planar length in coordinate units — DuckDB-spatial ST_Length semantics
    // (the reference's `length_degrees`, ITALY.md:165,269)
    spark.udf.register("st_length", (b: Array[Byte]) => lengthPlanar(b))
  }

  def lengthPlanar(b: Array[Byte]): Option[Double] =
    Wkb.readLineString(b).map { pts =>
      pts.sliding(2).collect { case Array(a, c) =>
        math.hypot(c._1 - a._1, c._2 - a._2)
      }.sum
    }.orElse(Wkb.readPoint(b).map(_ => 0.0))

  def wktToWkb(s: String): Option[Array[Byte]] = {
    if (s == null) return None
    val up = s.trim.toUpperCase
    if (up.startsWith("POINT")) Wkt.readPoint(s).map(p => Wkb.writePoint(p._1, p._2))
    else if (up.startsWith("LINESTRING")) {
      val pts = Wkt.points(s)
      if (pts.isEmpty) None else Some(Wkb.writeLineString(pts.toSeq))
    } else None
  }

  def geomType(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 5) return None
    if (Wkb.readPoint(b).isDefined) Some("POINT")
    else if (Wkb.readLineString(b).isDefined) Some("LINESTRING")
    else None
  }

  def nPoints(b: Array[Byte]): Option[Int] =
    Wkb.readPoint(b).map(_ => 1)
      .orElse(Wkb.readLineString(b).map(_.length))

  def asText(b: Array[Byte]): Option[String] =
    Wkb.readPoint(b).map(p => Wkt.writePoint(p._1, p._2))
      .orElse(Wkb.readLineString(b).map(ls => Wkt.writeLineString(ls.toSeq)))

  def asGeoJson(b: Array[Byte]): Option[String] =
    Wkb.readPoint(b).map { case (lon, lat) =>
      s"""{"type":"Point","coordinates":[$lon,$lat]}"""
    }.orElse(Wkb.readLineString(b).map { ls =>
      val coords = ls.map { case (lon, lat) => s"[$lon,$lat]" }.mkString(",")
      s"""{"type":"LineString","coordinates":[$coords]}"""
    })

  def lengthM(b: Array[Byte]): Option[Double] =
    Wkb.readLineString(b).map { pts =>
      pts.sliding(2).collect { case Array(a, c) =>
        Geo.haversineM(a._2, a._1, c._2, c._1)
      }.sum
    }.orElse(Wkb.readPoint(b).map(_ => 0.0))
}
