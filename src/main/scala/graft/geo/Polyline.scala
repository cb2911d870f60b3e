package graft.geo

import scala.collection.mutable.ArrayBuffer

/** Google encoded-polyline codec (precision 5 or 6).
  *
  * Needed for `travel_time_request` JSON fidelity: the reference's engine
  * returns route shapes as encoded polylines which the wrapper decodes
  * (reference: valhalla-wrapper/src/wrapper.cpp:118-120,204-221, precision 6).
  * Points are (lat, lon) per the polyline convention.
  */
object Polyline {

  def encode(points: Seq[(Double, Double)], precision: Int = 6): String = {
    val factor = math.pow(10, precision)
    val sb = new StringBuilder
    var prevLat = 0L; var prevLon = 0L
    points.foreach { case (lat, lon) =>
      val iLat = math.round(lat * factor)
      val iLon = math.round(lon * factor)
      encodeValue(iLat - prevLat, sb)
      encodeValue(iLon - prevLon, sb)
      prevLat = iLat; prevLon = iLon
    }
    sb.toString
  }

  def decode(encoded: String, precision: Int = 6): Array[(Double, Double)] = {
    val factor = math.pow(10, precision)
    val out = ArrayBuffer.empty[(Double, Double)]
    var i = 0; var lat = 0L; var lon = 0L
    while (i < encoded.length) {
      val (dLat, i2) = decodeValue(encoded, i)
      val (dLon, i3) = decodeValue(encoded, i2)
      lat += dLat; lon += dLon
      out += ((lat / factor, lon / factor))
      i = i3
    }
    out.toArray
  }

  private def encodeValue(v: Long, sb: StringBuilder): Unit = {
    var value = if (v < 0) ~(v << 1) else v << 1
    while (value >= 0x20) {
      sb.append(((0x20 | (value & 0x1f)) + 63).toChar)
      value >>= 5
    }
    sb.append((value + 63).toChar)
  }

  private def decodeValue(s: String, start: Int): (Long, Int) = {
    var i = start; var shift = 0; var result = 0L; var b = 0x20
    while (b >= 0x20 && i < s.length) {
      b = s.charAt(i) - 63
      result |= (b & 0x1f).toLong << shift
      shift += 5
      i += 1
    }
    val value = if ((result & 1) != 0) ~(result >> 1) else result >> 1
    (value, i)
  }
}
