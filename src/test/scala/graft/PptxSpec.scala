package graft

import graft.ops.Pptx
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Pptx]]: slide-numbered DrawingML extraction — numeric
  * part ordering, run concatenation, notes exclusion, refusal.
  */
class PptxSpec extends AnyFunSuite {

  test("extractText round-trips logicalText for 80 seeds") {
    (0L until 80L).foreach { seed =>
      val slides = Pptx.extractText(Pptx.syntheticPptx(seed))
        .getOrElse(fail(s"seed $seed: refused"))
      assert(slides.size === Pptx.nSlides(seed), s"seed $seed")
      assert(slides.mkString("\n") === Pptx.logicalText(seed), s"seed $seed")
    }
  }

  test("notes parts carry a:t runs but contribute nothing") {
    val slides = Pptx.extractText(Pptx.syntheticPptx(1L)).get
    assert(!slides.exists(_.contains("NOTES")),
      "notesSlide text must not leak into slide extraction")
  }

  test("slides order NUMERICALLY: slide2 before slide10") {
    // hand-built 12-slide deck, parts inserted in lexical order (slide1,
    // slide10, slide11, slide12, slide2, ...) — a lexical walk would
    // emit 'deck 10' right after 'deck 1'
    val out = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(out)
    val names = (1 to 12).map(k => s"ppt/slides/slide$k.xml").sorted // lexical
    names.foreach { name =>
      val k = name.replaceAll("\\D", "").toInt
      val xml = "<p:sld xmlns:a=\"a\" xmlns:p=\"p\"><p:cSld><p:spTree>" +
        s"<p:sp><p:txBody><a:p><a:r><a:t>deck $k</a:t></a:r></a:p>" +
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(xml.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val slides = Pptx.extractText(out.toByteArray).get
    assert(slides === (1 to 12).map(k => s"deck $k").toVector)
  }

  test("presentation.xml sldIdLst order WINS over numeric part order (ADVICE r12)") {
    // seed%4==1 decks carry presentation.xml listing parts in reversed
    // numeric order — extraction must follow the rels, and logicalText
    // mirrors it
    val seed = (0L until 16L).find(sd =>
      Pptx.relsOrdered(sd) && Pptx.nSlides(sd) > 1).get
    val slides = Pptx.extractText(Pptx.syntheticPptx(seed)).get
    assert(slides.mkString("\n") === Pptx.logicalText(seed))
    // the rels order really is the reverse of the numeric order
    val numeric = (0 until Pptx.nSlides(seed))
      .map(s => Pptx.logicalSlide(seed, s)).mkString("\n")
    assert(slides.mkString("\n") !== numeric,
      "rels reversal must be observable")
    assert(slides === (Pptx.nSlides(seed) - 1 to 0 by -1)
      .map(s => Pptx.logicalSlide(seed, s)).toVector)
    // presentation.xml WITHOUT its rels cannot resolve r:ids: refuse
    val bytes = Pptx.syntheticPptx(seed)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(out)
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName != "ppt/_rels/presentation.xml.rels") {
        zos.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        val buf = new Array[Byte](8192)
        var r = zin.read(buf)
        while (r >= 0) { zos.write(buf, 0, r); r = zin.read(buf) }
        zos.closeEntry()
      }
      e = zin.getNextEntry
    }
    zin.close(); zos.close()
    assert(Pptx.extractText(out.toByteArray).isEmpty,
      "unresolvable authored order must refuse, not guess numeric")
  }

  test("corrupt containers refuse; zero-slide decks refuse") {
    assert(Pptx.extractText(null).isEmpty)
    assert(Pptx.extractText("not a zip".getBytes).isEmpty)
    val good = Pptx.syntheticPptx(1L)
    assert(Pptx.extractText(java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    // a valid zip without any slide part (e.g. a DOCX) refuses
    assert(Pptx.extractText(graft.ops.Docx.syntheticDocx(1L)).isEmpty)
    // ill-formed slide XML refuses
    val out = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(out)
    zos.putNextEntry(new java.util.zip.ZipEntry("ppt/slides/slide1.xml"))
    zos.write("<p:sld><unclosed".getBytes); zos.closeEntry(); zos.close()
    assert(Pptx.extractText(out.toByteArray).isEmpty)
  }

  test("PPTX routes through the media vocabulary: media_kind = pptx") {
    val bytes = Pptx.syntheticPptx(5L)
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(bytes)
    assert(kind === "pptx")
    val text = Pptx.logicalText(5L)
    assert(feats(0) === Pptx.nSlides(5L).toFloat)
    assert(feats(2) === text.length.toFloat)
    // and a DOCX still routes docx (zip dispatch is content-keyed)
    assert(graft.ops.Multimodal
      .decodeWithKind(graft.ops.Docx.syntheticDocx(5L))._1 === "docx")
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "pptx-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.pptx"),
        Pptx.syntheticPptx(seed))
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        Pptx.logicalText(seed).getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.pptx")))
  }
}
