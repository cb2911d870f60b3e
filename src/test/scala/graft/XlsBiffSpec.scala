package graft

import graft.ops.{Cfb, Xls}
import org.scalatest.funsuite.AnyFunSuite

class XlsBiffSpec extends AnyFunSuite {

  test("fixture round-trip: 80 seeds extract exactly the closed-form grids") {
    for (seed <- 0L until 80L) {
      val got = Xls.extractText(Xls.syntheticXls(seed))
        .getOrElse(fail(s"seed $seed refused"))
      val want = (0 until Xls.sheetCount(seed)).map(Xls.logicalSheet(seed, _))
      assert(got == want.toVector, s"seed $seed")
    }
  }

  test("shuffled cell records assemble in (row, col) order") {
    // the fixture writes records as (1,1), (0,0), (1,0), (0,1); the
    // closed form is row-major — equality IS the ordering proof, but
    // pin it explicitly on one grid
    val sheet = Xls.extractText(Xls.syntheticXls(10L)).get.head
    val rows = sheet.split("\n")
    assert(rows.length == 2 && rows(0).startsWith("Cell 0 ") &&
      rows(1).startsWith("Total\t"))
  }

  test("SST encodings: compressed and UTF-16 strings both decode") {
    // (docId + s) % 2 == 0 plants ✓ → UTF-16; others stay compressed
    val sheets = Xls.extractText(Xls.syntheticXls(1L)).get // 2 sheets
    assert(!sheets.head.contains("✓") && sheets(1).contains("✓"))
  }

  test("dangling SST index refuses") {
    val streams = Cfb.read(Xls.syntheticXls(1L)).get
    val wb = streams("Workbook").clone()
    // find a LabelSst record (id 0x00FD) and bump its isst huge
    var p = 0
    var patched = false
    while (!patched && p + 4 <= wb.length) {
      val id = (wb(p) & 0xff) | ((wb(p + 1) & 0xff) << 8)
      val len = (wb(p + 2) & 0xff) | ((wb(p + 3) & 0xff) << 8)
      if (id == 0x00fd) {
        wb(p + 4 + 6) = 0x7f; wb(p + 4 + 7) = 0x7f; patched = true
      }
      p += 4 + len
    }
    assert(patched, "fixture carries a LabelSst record")
    val tampered = Cfb.write(Seq("Workbook" -> wb))
    assert(Xls.extractText(tampered).isEmpty)
  }

  test("non-integral numbers refuse; a missing Workbook stream refuses") {
    val streams = Cfb.read(Xls.syntheticXls(2L)).get
    val wb = streams("Workbook").clone()
    var p = 0
    var patched = false
    while (!patched && p + 4 <= wb.length) {
      val id = (wb(p) & 0xff) | ((wb(p + 1) & 0xff) << 8)
      val len = (wb(p + 2) & 0xff) | ((wb(p + 3) & 0xff) << 8)
      if (id == 0x0203) {
        val bits = java.lang.Double.doubleToLongBits(1.5)
        var j = 0
        while (j < 8) { wb(p + 4 + 6 + j) = ((bits >> (8 * j)) & 0xff).toByte; j += 1 }
        patched = true
      }
      p += 4 + len
    }
    assert(patched)
    assert(Xls.extractText(Cfb.write(Seq("Workbook" -> wb))).isEmpty,
      "1.5 has no exact cross-engine text form")
    val noWb = Cfb.write(Seq("Book" -> Array[Byte](1)))
    assert(Xls.extractText(noWb).isEmpty)
  }

  test("media_kind routes xls after doc; CFB dispatch stays exclusive") {
    assert(graft.ops.Multimodal.decodeWithKind(Xls.syntheticXls(4L))._1 == "xls")
    assert(graft.ops.Multimodal.decodeWithKind(
      graft.ops.Doc.syntheticDoc(4L))._1 == "doc")
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "xls-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.xls"),
        Xls.syntheticXls(seed))
      val text = (0 until Xls.sheetCount(seed))
        .map(Xls.logicalSheet(seed, _)).mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        text.getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.xls")))
  }
}
