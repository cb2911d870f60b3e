package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** WKB (well-known binary) codec for POINT and LINESTRING.
  *
  * Layout follows the reference's canonical forms:
  *  - 21-byte point, either endian (reference: valhalla-wrapper/src/wrapper.cpp:73-115)
  *  - little-endian LINESTRING `0x01, type=2, count, (lon lat)*` — 9 + 16n bytes
  *    (reference: src/travel_time_extension.cpp:391-428)
  *
  * Reads additionally accept EWKB (PostGIS) and ISO-WKB variants: the SRID
  * flag (0x20000000) skips the 4-byte SRID, Z/M flags (0x80000000 /
  * 0x40000000) and ISO +1000/+2000/+3000 type offsets widen the per-point
  * stride — flagged inputs previously passed the masked type check and
  * parsed SRID/Z bytes AS coordinates, silently snapping routes to garbage
  * locations.
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

  /** Parsed (E/ISO-)WKB header: base geometry type, per-point coordinate
    * count, and a buffer positioned at the geometry body (after any SRID).
    */
  private final case class Header(baseType: Int, dims: Int, buf: ByteBuffer)

  private def header(bytes: Array[Byte]): Option[Header] = {
    if (bytes == null || bytes.length < 5) return None
    val m = bytes(0)
    if (m != 0.toByte && m != 1.toByte) return None
    val buf = ByteBuffer.wrap(bytes).order(order(m))
    buf.get()
    val raw = buf.getInt()
    val hasSrid = (raw & 0x20000000) != 0
    var hasZ = (raw & 0x80000000) != 0
    var hasM = (raw & 0x40000000) != 0
    var base = raw & 0x0FFFFFFF
    // ISO WKB: Z = type+1000, M = type+2000, ZM = type+3000
    if (base >= 3000) { base -= 3000; hasZ = true; hasM = true }
    else if (base >= 2000) { base -= 2000; hasM = true }
    else if (base >= 1000) { base -= 1000; hasZ = true }
    if (hasSrid) {
      if (buf.remaining() < 4) return None
      buf.getInt() // skip SRID
    }
    Some(Header(base, 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0), buf))
  }

  /** Read one point's (lon, lat), skipping any Z/M ordinates. */
  private def point(h: Header): Option[(Double, Double)] = {
    if (h.buf.remaining() < 8 * h.dims) return None
    val lon = h.buf.getDouble(); val lat = h.buf.getDouble()
    var skip = h.dims - 2
    while (skip > 0) { h.buf.getDouble(); skip -= 1 }
    if (lon.isNaN || lat.isNaN) None else Some((lon, lat))
  }

  private def points(h: Header, n: Int): Option[Array[(Double, Double)]] = {
    if (n < 0 || h.buf.remaining() < 8L * h.dims * n) return None
    val out = new Array[(Double, Double)](n)
    var i = 0
    while (i < n) {
      point(h) match {
        case Some(p) => out(i) = p
        case None    => return None
      }
      i += 1
    }
    Some(out)
  }

  /** Parse a WKB POINT (either endianness, EWKB/ISO accepted). (lon, lat). */
  def readPoint(bytes: Array[Byte]): Option[(Double, Double)] =
    header(bytes).filter(_.baseType == PointType).flatMap(point)

  /** Parse a WKB LINESTRING. Returns (lon, lat) pairs. */
  def readLineString(bytes: Array[Byte]): Option[Array[(Double, Double)]] =
    header(bytes).filter(_.baseType == LineStringType).flatMap { h =>
      if (h.buf.remaining() < 4) None
      else points(h, h.buf.getInt())
    }

  /** Centroid of any supported WKB geometry → (lon, lat).
    * Mirrors the centroid-of-anything input convention of the reference
    * (rust/src/lib.rs:299-337): routing accepts any geometry and routes
    * from/to its centroid.
    */
  def centroid(bytes: Array[Byte]): Option[(Double, Double)] =
    header(bytes).flatMap { h =>
      h.baseType match {
        case PointType => point(h)
        case LineStringType =>
          if (h.buf.remaining() < 4) None
          else points(h, h.buf.getInt()).filter(_.nonEmpty).map(avg)
        case PolygonType =>
          // first (outer) ring vertex average, dropping the closing vertex
          if (h.buf.remaining() < 8) None
          else {
            val nRings = h.buf.getInt()
            if (nRings < 1) None
            else points(h, h.buf.getInt()).filter(_.nonEmpty).map { pts =>
              avg(if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts)
            }
          }
        case _ => None
      }
    }

  private def avg(pts: Array[(Double, Double)]): (Double, Double) =
    (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)

  /** Heuristic: does this blob look like WKB? Mirrors LooksLikeWkb
    * (reference: src/travel_time_extension.cpp:154-197) — endian marker in
    * {0,1}, known geometry type (EWKB/ISO variants included).
    */
  def looksLikeWkb(bytes: Array[Byte]): Boolean =
    header(bytes).exists(h => h.baseType >= PointType && h.baseType <= MultiPolygonType)
}
