package graft

import graft.ops.{Cfb, Doc}
import org.scalatest.funsuite.AnyFunSuite

class LegacyDocSpec extends AnyFunSuite {

  test("CFB round-trip: small (mini-FAT), large (FAT) and empty streams") {
    val streams = Seq(
      "small" -> Array.tabulate[Byte](100)(i => (i % 251).toByte),
      "WordDocument" -> Array.tabulate[Byte](5000)(i => ((i * 7) % 251).toByte),
      "tiny" -> Array[Byte](42),
      "empty" -> new Array[Byte](0))
    val container = Cfb.write(streams)
    val back = Cfb.read(container).getOrElse(fail("container refused"))
    assert(back.keySet == streams.map(_._1).toSet)
    for ((name, data) <- streams)
      assert(java.util.Arrays.equals(back(name), data), s"stream $name")
  }

  test("CFB refusals: magic, version, truncation, FAT cycle") {
    assert(Cfb.read(null).isEmpty)
    assert(Cfb.read("not a compound file at all".getBytes).isEmpty)
    val good = Cfb.write(Seq("s" -> Array[Byte](1, 2, 3)))
    assert(Cfb.read(good).isDefined)
    val badVer = good.clone(); badVer(26) = 4 // version 4 (4096-byte sectors)
    assert(Cfb.read(badVer).isEmpty, "version 4 refuses")
    assert(Cfb.read(good.take(512)).isEmpty, "truncated refuses")
    // point the directory's FAT entry at itself: chain cycle
    val cyc = good.clone()
    val dirStart = ((cyc(48) & 0xff) | ((cyc(49) & 0xff) << 8)).toInt
    val fatSect = ((cyc(76) & 0xff) | ((cyc(77) & 0xff) << 8)).toInt
    val at = 512 + fatSect * 512 + 4 * dirStart
    cyc(at) = dirStart.toByte; cyc(at + 1) = 0; cyc(at + 2) = 0; cyc(at + 3) = 0
    assert(Cfb.read(cyc).isEmpty, "FAT cycle refuses")
  }

  test("fixture round-trip: 80 seeds extract exactly the closed-form text") {
    for (seed <- 0L until 80L) {
      val got = Doc.extractText(Doc.syntheticDoc(seed))
        .getOrElse(fail(s"seed $seed refused"))
      val want = (0 until Doc.paraCount(seed)).map(Doc.logicalPara(seed, _))
      assert(got == want.toVector, s"seed $seed")
    }
  }

  test("field instructions never leak; cached results survive") {
    // seed 5 (odd → cp1252 pieces) has np=4: paragraph 3 carries the
    // HYPERLINK field as plain bytes, greppable in the raw container
    val raw = new String(Doc.syntheticDoc(5L),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(raw.contains("HYPERLINK"), "the instruction IS in the file")
    val text = Doc.extractText(Doc.syntheticDoc(5L)).get.mkString("\n")
    assert(!text.contains("HYPERLINK"), "instruction must not extract")
    assert(text.contains("linked"), "cached field result must extract")
  }

  test("fWhichTblStm selects 1Table vs 0Table; both appear across seeds") {
    val s0 = Cfb.read(Doc.syntheticDoc(0L)).get // docId%3==0 → 1Table
    assert(s0.contains("1Table") && !s0.contains("0Table"))
    val s1 = Cfb.read(Doc.syntheticDoc(1L)).get
    assert(s1.contains("0Table") && !s1.contains("1Table"))
    // flipping the FIB bit makes the named table stream missing → refuse
    val word = s0("WordDocument").clone()
    word(0x0a) = 0; word(0x0b) = 0 // now claims 0Table, which this file lacks
    val tampered = Cfb.write(Seq(
      "WordDocument" -> word, "1Table" -> s0("1Table")))
    assert(Doc.extractText(tampered).isEmpty)
  }

  test("unicode vs compressed pieces: the ✓ rides only even (unicode) docs") {
    assert(Doc.extractText(Doc.syntheticDoc(4L)).get.last.endsWith(" ✓"))
    assert(!Doc.extractText(Doc.syntheticDoc(3L)).get.last.contains("✓"))
  }

  test("mini-FAT and regular-FAT stream paths both round-trip") {
    // %5==0 docs pad WordDocument past the 4096 cutoff
    val big = Cfb.read(Doc.syntheticDoc(5L)).get("WordDocument")
    val small = Cfb.read(Doc.syntheticDoc(6L)).get("WordDocument")
    assert(big.length >= 4096 && small.length < 4096)
    assert(Doc.extractText(Doc.syntheticDoc(5L)).isDefined)
    assert(Doc.extractText(Doc.syntheticDoc(6L)).isDefined)
  }

  test("doc refusals: missing streams, bad FIB, truncated CLX") {
    val streams = Cfb.read(Doc.syntheticDoc(7L)).get
    val noWord = Cfb.write((streams - "WordDocument").toSeq)
    assert(Doc.extractText(noWord).isEmpty, "no WordDocument")
    val badIdent = streams("WordDocument").clone(); badIdent(0) = 0
    assert(Doc.extractText(Cfb.write(
      ("WordDocument" -> badIdent) +: (streams - "WordDocument").toSeq)).isEmpty,
      "bad wIdent")
    val shortClx = streams("WordDocument").clone()
    // lcbClx beyond the table stream
    shortClx(0x01a6) = 0xff.toByte; shortClx(0x01a7) = 0xff.toByte
    assert(Doc.extractText(Cfb.write(
      ("WordDocument" -> shortClx) +: (streams - "WordDocument").toSeq)).isEmpty,
      "CLX outside table stream")
  }

  test("media_kind routes doc; a bare CFB without WordDocument stays stub") {
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(Doc.syntheticDoc(3L))
    assert(kind == "doc")
    assert(feats(0) == Doc.paraCount(3L).toFloat)
    val bare = Cfb.write(Seq("Whatever" -> Array[Byte](1, 2)))
    assert(graft.ops.Multimodal.decodeWithKind(bare)._1 == "stub")
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "doc-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.doc"),
        Doc.syntheticDoc(seed))
      val text = (0 until Doc.paraCount(seed))
        .map(Doc.logicalPara(seed, _)).mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        text.getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.doc")))
  }
}
