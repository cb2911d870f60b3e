package graft

import graft.geo.{Geo, Polyline, Wkb, Wkt}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-codec properties (SURVEY §5b): WKT/WKB round-trips, polyline
  * round-trip, haversine sanity — the helpers ported from
  * valhalla-wrapper/src/wrapper.cpp:46-120 and
  * src/travel_time_extension.cpp:387-428. Property checks run over seeded
  * deterministic samples (scalatest+scalacheck bridge is not in the offline
  * cache, so sampling is hand-rolled).
  */
class GeoSpec extends AnyFunSuite {

  private def samples(n: Int, seed: Long = 42L): Seq[(Double, Double)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((r.nextDouble() * 170 - 85, r.nextDouble() * 358 - 179))
  }

  test("haversine: zero for identical points, symmetric, known value") {
    assert(Geo.haversineM(43.7, 7.4, 43.7, 7.4) == 0.0)
    samples(100).grouped(2).foreach { case Seq((a, b), (c, d)) =>
      assert(math.abs(Geo.haversineM(a, b, c, d) - Geo.haversineM(c, d, a, b)) < 1e-6)
    }
    // one degree of latitude ≈ 111.2 km on the mean-radius sphere
    val d = Geo.haversineM(43.0, 7.4, 44.0, 7.4)
    assert(math.abs(d - 111195.0) < 100.0)
  }

  test("WKB point round-trip (little-endian writer, both-endian reader)") {
    samples(200).foreach { case (y, x) =>
      val b = Wkb.writePoint(x, y)
      assert(b.length == 21)
      assert(Wkb.readPoint(b).contains((x, y)))
      assert(Wkb.looksLikeWkb(b))
    }
  }

  test("WKB big-endian point parses (wrapper.cpp:73-115 both-endian contract)") {
    val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(0.toByte); buf.putInt(1); buf.putDouble(7.42); buf.putDouble(43.73)
    assert(Wkb.readPoint(buf.array()).contains((7.42, 43.73)))
  }

  test("WKB linestring round-trip; layout is 9 + 16n bytes little-endian") {
    (0 until 20).foreach { i =>
      val ps = samples(i % 7 + 1, seed = i).map { case (a, o) => (o, a) }
      val b = Wkb.writeLineString(ps)
      assert(b.length == 9 + 16 * ps.length)
      assert(b(0) == 1.toByte)
      assert(Wkb.readLineString(b).map(_.toList).contains(ps.toList))
    }
  }

  test("EWKB/ISO variants: SRID skipped, Z/M stride honored, not parsed as coords") {
    // EWKB point with SRID flag 0x20000000 + SRID 4326 before the coords
    val srid = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    srid.put(1.toByte); srid.putInt(0x20000001); srid.putInt(4326)
    srid.putDouble(7.42); srid.putDouble(43.73)
    assert(Wkb.readPoint(srid.array()).contains((7.42, 43.73)))
    assert(Wkb.looksLikeWkb(srid.array()))
    // EWKB Z point (flag 0x80000000): z ordinate skipped, not read as data
    val z = java.nio.ByteBuffer.allocate(29).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    z.put(1.toByte); z.putInt(0x80000001)
    z.putDouble(7.42); z.putDouble(43.73); z.putDouble(120.0)
    assert(Wkb.readPoint(z.array()).contains((7.42, 43.73)))
    // ISO-WKB ZM point (type 3001)
    val zm = java.nio.ByteBuffer.allocate(37).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    zm.put(1.toByte); zm.putInt(3001)
    zm.putDouble(7.42); zm.putDouble(43.73); zm.putDouble(120.0); zm.putDouble(9.0)
    assert(Wkb.readPoint(zm.array()).contains((7.42, 43.73)))
    // EWKB Z linestring: stride 3 per point
    val zl = java.nio.ByteBuffer.allocate(9 + 24 * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    zl.put(1.toByte); zl.putInt(0x80000002); zl.putInt(2)
    zl.putDouble(1.0); zl.putDouble(2.0); zl.putDouble(9.0)
    zl.putDouble(3.0); zl.putDouble(4.0); zl.putDouble(9.0)
    assert(Wkb.readLineString(zl.array()).map(_.toList).contains(List((1.0, 2.0), (3.0, 4.0))))
    // truncated SRID header rejected, not parsed as coordinates
    assert(Wkb.readPoint(java.util.Arrays.copyOf(srid.array(), 21)).isEmpty)
  }

  test("WKB garbage rejected") {
    assert(Wkb.readPoint(Array[Byte](9, 9, 9)) == None)
    assert(Wkb.readLineString("not wkb".getBytes) == None)
    assert(!Wkb.looksLikeWkb("hello world".getBytes))
    assert(!Wkb.looksLikeWkb(null))
  }

  test("WKT point parse + centroid of linestring/polygon") {
    assert(Wkt.readPoint("POINT(7.42 43.73)").contains((7.42, 43.73)))
    assert(Wkt.readPoint("  point ( 7.42   43.73 ) ").isDefined)
    assert(Wkt.readPoint("LINESTRING(0 0, 1 1)") == None)
    assert(Wkt.centroid("LINESTRING(0 0, 2 0, 2 2, 0 2)").contains((1.0, 1.0)))
    val c = Wkt.centroid("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))").get
    assert(math.abs(c._1 - 1.6) < 1e-9 && math.abs(c._2 - 1.6) < 1e-9)
    assert(Wkt.centroid("nonsense") == None)
    assert(Wkt.centroid(null) == None)
  }

  test("WKT negative/exponent coordinates parse") {
    assert(Wkt.readPoint("POINT(-120.95 40.7)").contains((-120.95, 40.7)))
    assert(Wkt.points("LINESTRING(1e2 -3.5e-1, 2 3)").head == (100.0, -0.35))
  }

  test("WKB centroid matches WKT centroid for linestrings") {
    val pts = Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0))
    val viaWkb = Wkb.centroid(Wkb.writeLineString(pts)).get
    val viaWkt = Wkt.centroid(Wkt.writeLineString(pts)).get
    assert(viaWkb == viaWkt)
  }

  test("polyline encode/decode round-trip at precision 6 (wrapper.cpp:118-120)") {
    (0 until 20).foreach { i =>
      val ps = samples(8, seed = 100 + i)
      val decoded = Polyline.decode(Polyline.encode(ps), precision = 6)
      assert(decoded.length == ps.length)
      ps.zip(decoded).foreach { case ((a1, o1), (a2, o2)) =>
        assert(math.abs(a1 - a2) < 1e-6 + 1e-9)
        assert(math.abs(o1 - o2) < 1e-6 + 1e-9)
      }
    }
  }

  test("polyline golden: Google's documented example (precision 5)") {
    val pts = Seq((38.5, -120.2), (40.7, -120.95), (43.252, -126.453))
    assert(Polyline.encode(pts, precision = 5) == "_p~iF~ps|U_ulLnnqC_mqNvxq`@")
  }
}
