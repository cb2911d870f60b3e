package graft

import graft.ops.Opc
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Opc]] containers: central-directory ZIP64/data-descriptor
  * reads (VERDICT r12 #7) and the streaming-first fallback contract.
  */
class OpcSpec extends AnyFunSuite {

  private val entries = Seq(
    "a/first.xml" -> "<a>one</a>".getBytes("UTF-8"),
    "b/second.xml" -> ("<b>" + "x" * 5000 + "</b>").getBytes("UTF-8"),
    "c/third.bin" -> Array.tabulate[Byte](256)(_.toByte))

  test("writeZip64 containers REFUSE the streaming walk but read via the central directory") {
    val z = Opc.writeZip64(entries)
    // the streaming reader cannot handle STORED + data descriptor
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(z))
    intercept[java.util.zip.ZipException] {
      var e = zin.getNextEntry
      while (e != null) {
        val buf = new Array[Byte](8192)
        while (zin.read(buf) >= 0) ()
        e = zin.getNextEntry
      }
    }
    zin.close()
    // zipEntries falls back and returns every entry byte-exact
    val got = Opc.zipEntries(z, _ => true, 1 << 20)
    assert(got.map(_._1) === entries.map(_._1))
    got.zip(entries).foreach { case ((_, g), (_, w)) =>
      assert(java.util.Arrays.equals(g, w))
    }
    // the Python-reference reader agrees: zipfile is central-directory
    // based, so the container is interoperable (checked by the office
    // fixture mirrors on the seed classes)
    val filtered = Opc.zipEntries(z, _.startsWith("b/"), 1 << 20)
    assert(filtered.map(_._1) === Seq("b/second.xml"))
  }

  test("classic zips prefer the cheap streaming walk; both paths agree") {
    val out = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(out)
    entries.foreach { case (n, b) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(b); zos.closeEntry()
    }
    zos.close()
    val z = out.toByteArray
    val a = Opc.zipEntries(z, _ => true, 1 << 20)
    val b = Opc.readZipCentral(z, _ => true, 1 << 20)
    assert(a.map(_._1) === b.map(_._1))
    a.zip(b).foreach { case ((_, x), (_, y)) =>
      assert(java.util.Arrays.equals(x, y))
    }
  }

  test("genuine corruption refuses on BOTH paths") {
    val z = Opc.writeZip64(entries)
    // truncating the central directory kills the fallback too
    intercept[IllegalArgumentException] {
      Opc.zipEntries(java.util.Arrays.copyOf(z, z.length / 2), _ => true, 1 << 20)
    }
    // a flipped central signature is loud
    val mut = z.clone()
    val cdSig = Array[Byte](0x50, 0x4b, 0x01, 0x02)
    val at = mut.indices.find(i => i + 4 <= mut.length &&
      mut(i) == cdSig(0) && mut(i + 1) == cdSig(1) &&
      mut(i + 2) == cdSig(2) && mut(i + 3) == cdSig(3)).get
    mut(at + 2) = 0x7f
    intercept[IllegalArgumentException] {
      Opc.zipEntries(mut, _ => true, 1 << 20)
    }
    // the per-part cap binds on the fallback path as well
    intercept[IllegalArgumentException] {
      Opc.zipEntries(z, _ => true, 16)
    }
  }

  test("coreProperties: Dublin Core fields round-trip, absence is None") {
    val b = graft.ops.Pptx.syntheticPptx(5L)
    val cp = Opc.coreProperties(b).get
    assert(cp.title.get.startsWith("Pptx 5 "))
    assert(cp.creator === Some("author-5"))
    assert(cp.created === Some("2025-01-06T00:00:00Z"))
    assert(cp.modified === Some("2025-01-09T00:00:00Z"))
    // a package without docProps/core.xml has no properties
    val z = Opc.writeZip64(Seq("word/document.xml" -> "<w/>".getBytes("UTF-8")))
    assert(Opc.coreProperties(z).isEmpty)
    // corrupt container is data
    assert(Opc.coreProperties("PK garbage".getBytes).isEmpty)
    // and the zip64 fixture classes carry core props too
    assert(Opc.coreProperties(graft.ops.Docx.syntheticDocx(1L)).isDefined)
  }

  test("office extractors round-trip their ZIP64 fixture classes") {
    val pptxSeed = (0L until 24L).find(_ % 6 == 2).get
    assert(graft.ops.Pptx.extractText(graft.ops.Pptx.syntheticPptx(pptxSeed))
      .get.mkString("\n") === graft.ops.Pptx.logicalText(pptxSeed))
    val xlsxSeed = (0L until 24L).find(_ % 6 == 4).get
    assert(graft.ops.Xlsx.extractText(graft.ops.Xlsx.syntheticXlsx(xlsxSeed))
      .get.mkString("\n") === graft.ops.Xlsx.logicalText(xlsxSeed))
    val docxSeed = (0L until 24L).find(_ % 6 == 1).get
    assert(graft.ops.Docx.extractText(graft.ops.Docx.syntheticDocx(docxSeed))
      .get.mkString("\n") === graft.ops.Docx.logicalText(docxSeed))
  }
}
