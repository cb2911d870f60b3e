package graft

import graft.ops.Docx
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Docx]]: ZIP + WordprocessingML extraction — run
  * concatenation, tab/break run content vs tab-stop definitions,
  * entities, refusal on broken containers.
  */
class DocxSpec extends AnyFunSuite {

  test("extractText round-trips logicalText for 80 seeds") {
    (0L until 80L).foreach { seed =>
      val paras = Docx.extractText(Docx.syntheticDocx(seed))
        .getOrElse(fail(s"seed $seed: refused"))
      assert(paras.size === Docx.nParas(seed), s"seed $seed")
      assert(paras.mkString("\n") === Docx.logicalText(seed), s"seed $seed")
    }
  }

  test("a tab-STOP definition under w:pPr/w:tabs contributes no text") {
    // seed with a % 4 == 1 paragraph (i = 1 always exists) — the fixture
    // plants <w:pPr><w:tabs><w:tab/></w:tabs></w:pPr> there; if the
    // walker counted it, paragraph 1 would grow a phantom leading TAB
    val paras = Docx.extractText(Docx.syntheticDocx(0L)).get
    assert(!paras(1).startsWith("\t"),
      "tab-stop definition must not emit a TAB")
    assert(paras(1) === Docx.logicalPara(0L, 1))
  }

  test("entities and control content decode: & < > tab break") {
    // paragraph 0 carries the entity suffix; paragraph 2 the <w:br/>
    val paras = Docx.extractText(Docx.syntheticDocx(3L)).get
    assert(paras(0).contains("\ta<b & c"), "tab + decoded entities")
    assert(paras(2).contains("\nwrapped x>y"), "in-paragraph break")
  }

  test("corrupt containers refuse instead of crashing") {
    assert(Docx.extractText(null).isEmpty)
    assert(Docx.extractText("not a zip".getBytes).isEmpty)
    val good = Docx.syntheticDocx(1L)
    // truncation breaks the zip stream
    assert(Docx.extractText(java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    // a valid zip WITHOUT word/document.xml refuses
    val out = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(out)
    zos.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    zos.write("hi".getBytes); zos.closeEntry(); zos.close()
    assert(Docx.extractText(out.toByteArray).isEmpty)
    // ill-formed XML inside a valid zip refuses
    val out2 = new java.io.ByteArrayOutputStream()
    val zos2 = new java.util.zip.ZipOutputStream(out2)
    zos2.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zos2.write("<w:document><unclosed".getBytes); zos2.closeEntry(); zos2.close()
    assert(Docx.extractText(out2.toByteArray).isEmpty)
  }

  test("DOCX routes through the media vocabulary: media_kind = docx") {
    val bytes = Docx.syntheticDocx(7L)
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(bytes)
    assert(kind === "docx")
    val text = Docx.logicalText(7L)
    assert(feats(0) === Docx.nParas(7L).toFloat)
    assert(feats(1) === (1 + text.count(_ == '\n')).toFloat)
    assert(feats(2) === text.length.toFloat)
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "docx-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.docx"),
        Docx.syntheticDocx(seed))
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        Docx.logicalText(seed).getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.docx")))
  }
}
