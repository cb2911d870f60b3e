package graft

import graft.ops.Xlsx
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Xlsx]]: shared-string resolution (dedup, rich runs),
  * inlineStr/formula/numeric cells, numeric sheet order, refusal.
  */
class XlsxSpec extends AnyFunSuite {

  test("extractText round-trips logicalText for 80 seeds") {
    (0L until 80L).foreach { seed =>
      val sheets = Xlsx.extractText(Xlsx.syntheticXlsx(seed))
        .getOrElse(fail(s"seed $seed: refused"))
      assert(sheets.size === Xlsx.nSheets(seed), s"seed $seed")
      assert(sheets.mkString("\n") === Xlsx.logicalText(seed), s"seed $seed")
    }
  }

  test("shared strings: dedup reuse, rich-text run concatenation") {
    // pick a seed with a 3-row sheet (rows 0 and 2 share the col0 <si>)
    val seed = (0L until 20L).find(sd => Xlsx.nRows(sd, 0) == 3).get
    val bytes = Xlsx.syntheticXlsx(seed)
    val sheets = Xlsx.extractText(bytes).get
    val rows = sheets(0).split('\n')
    assert(rows(0).split('\t')(0) === rows(2).split('\t')(0),
      "rows 0 and 2 resolve the SAME deduplicated shared string")
    // the rich-text entries round-trip despite the two-run split
    assert(Xlsx.logicalText(seed).contains("Rich "),
      "fixture must exercise a rich-text entry")
  }

  test("a dangling shared-string index refuses (no silent misalignment)") {
    val good = Xlsx.syntheticXlsx(1L)
    // rewrite the sharedStrings part to an EMPTY table: every t="s"
    // lookup then dangles
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(good))
    val out = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(out)
    var entry = zin.getNextEntry
    while (entry != null) {
      zos.putNextEntry(new java.util.zip.ZipEntry(entry.getName))
      if (entry.getName == "xl/sharedStrings.xml")
        zos.write(("<?xml version=\"1.0\"?><sst xmlns=\"x\" count=\"0\" " +
          "uniqueCount=\"0\"></sst>").getBytes("UTF-8"))
      else {
        val buf = new Array[Byte](8192)
        var r = zin.read(buf)
        while (r >= 0) { zos.write(buf, 0, r); r = zin.read(buf) }
      }
      zos.closeEntry()
      entry = zin.getNextEntry
    }
    zin.close(); zos.close()
    assert(Xlsx.extractText(out.toByteArray).isEmpty,
      "an out-of-range shared index must refuse, not swap strings")
  }

  test("workbook.xml <sheets> order WINS over numeric part order (ADVICE r12)") {
    // seed%4==3 workbooks list sheet parts in reversed numeric order
    val seed = (0L until 16L).find(Xlsx.relsOrdered).get
    assert(Xlsx.nSheets(seed) === 2, "seed%4==3 is odd, so two sheets")
    val sheets = Xlsx.extractText(Xlsx.syntheticXlsx(seed)).get
    assert(sheets.mkString("\n") === Xlsx.logicalText(seed))
    assert(sheets === Vector(Xlsx.logicalSheet(seed, 1), Xlsx.logicalSheet(seed, 0)),
      "workbook order is the REVERSE of numeric part order on this class")
  }

  test("corrupt containers refuse; other OPC packages refuse") {
    assert(Xlsx.extractText(null).isEmpty)
    assert(Xlsx.extractText("not a zip".getBytes).isEmpty)
    val good = Xlsx.syntheticXlsx(1L)
    assert(Xlsx.extractText(java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    assert(Xlsx.extractText(graft.ops.Docx.syntheticDocx(1L)).isEmpty)
    assert(Xlsx.extractText(graft.ops.Pptx.syntheticPptx(1L)).isEmpty)
  }

  test("XLSX routes through the media vocabulary: media_kind = xlsx") {
    val bytes = Xlsx.syntheticXlsx(6L)
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(bytes)
    assert(kind === "xlsx")
    assert(feats(0) === Xlsx.nSheets(6L).toFloat)
    assert(feats(2) === Xlsx.logicalText(6L).length.toFloat)
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "xlsx-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.xlsx"),
        Xlsx.syntheticXlsx(seed))
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        Xlsx.logicalText(seed).getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.xlsx")))
  }
}
