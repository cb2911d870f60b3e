package graft

import graft.ops.{Cfb, Msg}
import org.scalatest.funsuite.AnyFunSuite

class MsgSpec extends AnyFunSuite {

  test("fixture round-trip: 80 seeds extract exactly the closed-form mail") {
    for (seed <- 0L until 80L) {
      val m = Msg.extractMail(Msg.syntheticMsg(seed))
        .getOrElse(fail(s"seed $seed refused"))
      assert(m.subject == Msg.logicalSubject(seed), s"seed $seed subject")
      assert(m.fromAddr == Msg.logicalFrom(seed), s"seed $seed from")
      assert(m.body == Msg.logicalBody(seed), s"seed $seed body")
    }
  }

  test("unicode store wins when both property types are present") {
    val streams = Cfb.read(Msg.syntheticMsg(1L)).get // ANSI store
    val both = streams.toSeq :+
      ("__substg1.0_0037001F" ->
        "Unicode wins".getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    val m = Msg.extractMail(Cfb.write(both)).get
    assert(m.subject == "Unicode wins")
  }

  test("refusals: missing body, odd UTF-16 length, undefined cp1252 byte") {
    val streams = Cfb.read(Msg.syntheticMsg(2L)).get
    val noBody = Cfb.write((streams - "__substg1.0_1000001F").toSeq)
    assert(Msg.extractMail(noBody).isEmpty, "missing body property")
    val odd = Cfb.write((streams - "__substg1.0_0037001F").toSeq :+
      ("__substg1.0_0037001F" -> Array[Byte](65)))
    assert(Msg.extractMail(odd).isEmpty, "odd UTF-16 length")
    val ansiStreams = Cfb.read(Msg.syntheticMsg(3L)).get
    val badByte = Cfb.write((ansiStreams - "__substg1.0_1000001E").toSeq :+
      ("__substg1.0_1000001E" -> Array[Byte](66, 0x81.toByte)))
    assert(Msg.extractMail(badByte).isEmpty, "0x81 undefined in cp1252")
  }

  test("media_kind routes msg; all four CFB kinds stay mutually exclusive") {
    assert(graft.ops.Multimodal.decodeWithKind(Msg.syntheticMsg(6L))._1 == "msg")
    assert(graft.ops.Multimodal.decodeWithKind(
      graft.ops.Ppt.syntheticPpt(6L))._1 == "ppt")
    assert(graft.ops.Multimodal.decodeWithKind(
      graft.ops.Xls.syntheticXls(6L))._1 == "xls")
    assert(graft.ops.Multimodal.decodeWithKind(
      graft.ops.Doc.syntheticDoc(6L))._1 == "doc")
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "msg-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.msg"),
        Msg.syntheticMsg(seed))
      val text = Msg.logicalSubject(seed) + " " + Msg.logicalFrom(seed) +
        " " + Msg.logicalBody(seed)
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        text.getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.msg")))
  }
}
