package graft.graph

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Minimal OSM PBF writer — enough to build self-contained fixtures that
  * round-trip through [[OsmPbf]] (zlib-compressed DenseNodes + tagged Ways),
  * standing in for real extracts in tests and examples.
  */
object OsmPbfWriter {

  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes(StandardCharsets.UTF_8))
    def message(field: Int, m: W): Unit = bytes(field, m.toBytes)
    def packed(field: Int, vs: Seq[Long], zz: Boolean): Unit = {
      val p = new W; vs.foreach(v => if (zz) p.zigzag(v) else p.varint(v))
      bytes(field, p.toBytes)
    }
    def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def toBytes: Array[Byte] = out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    // loop until finished: a single deflate() call over a fixed buffer
    // silently truncates incompressible payloads into corrupt blobs
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  /** Write nodes + tagged ways as a single-OSMData-blob PBF file. */
  def write(path: String, nodes: Seq[OsmPbf.OsmNode],
            ways: Seq[(Long, Map[String, String], Seq[Long])]): Unit = {
    // string table: index 0 must be the empty string
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def intern(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    ways.foreach { case (_, tags, _) => tags.foreach { case (k, v) => intern(k); intern(v) } }

    def deltas(vs: Seq[Long]): Seq[Long] =
      if (vs.isEmpty) Nil
      else vs.head +: vs.lazyZip(vs.tail).map((a, b) => b - a).toSeq

    val group = new W
    // DenseNodes (field 2): delta-coded packed ids/lats/lons (granularity 100)
    if (nodes.nonEmpty) {
      val dense = new W
      dense.packed(1, deltas(nodes.map(_.id)), zz = true)
      dense.packed(8, deltas(nodes.map(n => math.round(n.lat * 1e9) / 100)), zz = true)
      dense.packed(9, deltas(nodes.map(n => math.round(n.lon * 1e9) / 100)), zz = true)
      group.message(2, dense)
    }
    ways.foreach { case (id, tags, refs) =>
      val w = new W
      w.int(1, id)
      w.packed(2, tags.keys.map(intern(_).toLong).toSeq, zz = false)
      w.packed(3, tags.values.map(intern(_).toLong).toSeq, zz = false)
      w.packed(8, deltas(refs), zz = true)
      group.message(3, w)
    }

    val block = new W
    val st = new W
    strings.keys.foreach(s => st.string(1, s))
    block.message(1, st)
    block.message(2, group)
    block.int(17, 100) // granularity

    def blob(payload: Array[Byte]): Array[Byte] = {
      val b = new W
      b.int(2, payload.length)
      b.bytes(3, deflate(payload))
      b.toBytes
    }
    def header(tpe: String, dataSize: Int): Array[Byte] = {
      val h = new W; h.string(1, tpe); h.int(3, dataSize); h.toBytes
    }

    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      // minimal OSMHeader blob (raw, empty HeaderBlock)
      val hb = { val b = new W; b.int(2, 0); b.bytes(1, Array.empty); b.toBytes }
      val hh = header("OSMHeader", hb.length)
      out.writeInt(hh.length); out.write(hh); out.write(hb)
      val data = blob(block.toBytes)
      val dh = header("OSMData", data.length)
      out.writeInt(dh.length); out.write(dh); out.write(data)
    } finally out.close()
  }
}
