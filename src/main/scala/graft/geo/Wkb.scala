package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** WKB (well-known binary) codec for POINT and LINESTRING.
  *
  * Layout follows the reference's canonical forms:
  *  - 21-byte point, either endian (reference: valhalla-wrapper/src/wrapper.cpp:73-115)
  *  - little-endian LINESTRING `0x01, type=2, count, (lon lat)*` — 9 + 16n bytes
  *    (reference: src/travel_time_extension.cpp:391-428)
  */
object Wkb {
  final val PointType = 1
  final val LineStringType = 2
  final val PolygonType = 3
  final val MultiPointType = 4
  final val MultiLineStringType = 5
  final val MultiPolygonType = 6

  /** (lon, lat) */
  def writePoint(lon: Double, lat: Double): Array[Byte] = {
    val buf = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte) // little-endian marker
    buf.putInt(PointType)
    buf.putDouble(lon)
    buf.putDouble(lat)
    buf.array()
  }

  /** points are (lon, lat) pairs */
  def writeLineString(points: Seq[(Double, Double)]): Array[Byte] = {
    val buf = ByteBuffer.allocate(9 + 16 * points.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte)
    buf.putInt(LineStringType)
    buf.putInt(points.length)
    points.foreach { case (lon, lat) => buf.putDouble(lon); buf.putDouble(lat) }
    buf.array()
  }

  private def order(b: Byte): ByteOrder =
    if (b == 1.toByte) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN

  /** Parse a WKB POINT (either endianness). Returns (lon, lat). */
  def readPoint(bytes: Array[Byte]): Option[(Double, Double)] = {
    if (bytes == null || bytes.length < 21) return None
    val buf = ByteBuffer.wrap(bytes).order(order(bytes(0)))
    buf.get()
    val tpe = buf.getInt() & 0xff // mask off SRID/Z flags
    if (tpe != PointType) return None
    val lon = buf.getDouble(); val lat = buf.getDouble()
    if (lon.isNaN || lat.isNaN) None else Some((lon, lat))
  }

  /** Parse a WKB LINESTRING. Returns (lon, lat) pairs. */
  def readLineString(bytes: Array[Byte]): Option[Array[(Double, Double)]] = {
    if (bytes == null || bytes.length < 9) return None
    val buf = ByteBuffer.wrap(bytes).order(order(bytes(0)))
    buf.get()
    if ((buf.getInt() & 0xff) != LineStringType) return None
    val n = buf.getInt()
    if (n < 0 || bytes.length < 9 + 16L * n) return None
    val out = new Array[(Double, Double)](n)
    var i = 0
    while (i < n) { out(i) = (buf.getDouble(), buf.getDouble()); i += 1 }
    Some(out)
  }

  /** Centroid of any supported WKB geometry → (lon, lat).
    * Mirrors the centroid-of-anything input convention of the reference
    * (rust/src/lib.rs:299-337): routing accepts any geometry and routes
    * from/to its centroid.
    */
  def centroid(bytes: Array[Byte]): Option[(Double, Double)] = {
    if (bytes == null || bytes.length < 5) return None
    val buf = ByteBuffer.wrap(bytes).order(order(bytes(0)))
    buf.get()
    (buf.getInt() & 0xff) match {
      case PointType => readPoint(bytes)
      case LineStringType =>
        readLineString(bytes).filter(_.nonEmpty).map(avg)
      case PolygonType =>
        // first (outer) ring vertex average, dropping the closing vertex
        val nRings = buf.getInt()
        if (nRings < 1) None
        else {
          val n = buf.getInt()
          if (n < 1 || bytes.length < 13 + 16L * n) None
          else {
            val pts = new Array[(Double, Double)](n)
            var i = 0
            while (i < n) { pts(i) = (buf.getDouble(), buf.getDouble()); i += 1 }
            val ring = if (n > 1 && pts.head == pts.last) pts.dropRight(1) else pts
            Some(avg(ring))
          }
        }
      case _ => None
    }
  }

  private def avg(pts: Array[(Double, Double)]): (Double, Double) =
    (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)

  /** Heuristic: does this blob look like WKB? Mirrors LooksLikeWkb
    * (reference: src/travel_time_extension.cpp:154-197) — endian marker in
    * {0,1}, known geometry type, plausible length, finite coordinates.
    */
  def looksLikeWkb(bytes: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < 5) return false
    val m = bytes(0)
    if (m != 0.toByte && m != 1.toByte) return false
    val buf = ByteBuffer.wrap(bytes).order(order(m))
    buf.get()
    val t = buf.getInt() & 0xff
    t >= PointType && t <= MultiPolygonType
  }
}
