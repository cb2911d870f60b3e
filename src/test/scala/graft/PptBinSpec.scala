package graft

import graft.ops.{Cfb, Ppt}
import org.scalatest.funsuite.AnyFunSuite

class PptBinSpec extends AnyFunSuite {

  test("fixture round-trip: 80 seeds extract exactly the closed-form slides") {
    for (seed <- 0L until 80L) {
      val got = Ppt.extractText(Ppt.syntheticPpt(seed))
        .getOrElse(fail(s"seed $seed refused"))
      val want = (0 until Ppt.slideCount(seed)).map(Ppt.logicalSlide(seed, _))
      assert(got == want.toVector, s"seed $seed")
    }
  }

  test("notes list (instance 2) carries text atoms but contributes nothing") {
    val raw = Cfb.read(Ppt.syntheticPpt(3L)).get("PowerPoint Document")
    val asLatin = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(asLatin.contains("Notes trap"), "the notes text IS in the stream")
    val text = Ppt.extractText(Ppt.syntheticPpt(3L)).get.mkString("\n")
    assert(!text.contains("Notes trap"))
  }

  test("bytes vs chars atoms: ✓ rides only even (docId+s) slides") {
    val slides = Ppt.extractText(Ppt.syntheticPpt(1L)).get // 2 slides
    assert(!slides.head.contains("✓") && slides(1).contains("✓"))
  }

  test("refusals: missing stream, record overrun, text before persist atom") {
    val noDoc = Cfb.write(Seq("Whatever" -> Array[Byte](1, 2, 3)))
    assert(Ppt.extractText(noDoc).isEmpty)
    val streams = Cfb.read(Ppt.syntheticPpt(2L)).get
    val doc = streams("PowerPoint Document").clone()
    // corrupt the top-level record length to overrun
    doc(4) = 0xff.toByte; doc(5) = 0xff.toByte
    assert(Ppt.extractText(Cfb.write(Seq("PowerPoint Document" -> doc))).isEmpty)
    // an orphan text atom ahead of any persist atom refuses
    def rec(verInst: Int, recType: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      out(0) = (verInst & 0xff).toByte; out(1) = ((verInst >> 8) & 0xff).toByte
      out(2) = (recType & 0xff).toByte; out(3) = ((recType >> 8) & 0xff).toByte
      out(4) = (payload.length & 0xff).toByte
      out(5) = ((payload.length >> 8) & 0xff).toByte
      System.arraycopy(payload, 0, out, 8, payload.length)
      out
    }
    val orphan = rec(0x000f, 0x03e8,
      rec(0x000f, 0x0ff0, rec(0, 0x0fa8, "orphan".getBytes)))
    assert(Ppt.extractText(Cfb.write(
      Seq("PowerPoint Document" -> orphan))).isEmpty)
  }

  test("media_kind routes ppt; the three CFB kinds stay mutually exclusive") {
    assert(graft.ops.Multimodal.decodeWithKind(Ppt.syntheticPpt(5L))._1 == "ppt")
    assert(graft.ops.Multimodal.decodeWithKind(
      graft.ops.Xls.syntheticXls(5L))._1 == "xls")
    assert(graft.ops.Multimodal.decodeWithKind(
      graft.ops.Doc.syntheticDoc(5L))._1 == "doc")
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "ppt-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.ppt"),
        Ppt.syntheticPpt(seed))
      val text = (0 until Ppt.slideCount(seed))
        .map(Ppt.logicalSlide(seed, _)).mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        text.getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.ppt")))
  }
}
