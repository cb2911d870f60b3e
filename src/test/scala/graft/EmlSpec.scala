package graft

import graft.ops.Eml
import org.scalatest.funsuite.AnyFunSuite

class EmlSpec extends AnyFunSuite {

  private def extract(s: String): Option[Eml.Email] =
    Eml.extractEmail(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  test("fixture round-trip: 80 seeds extract exactly the closed-form email") {
    for (seed <- 0L until 80L) {
      val em = Eml.extractEmail(Eml.syntheticEml(seed))
        .getOrElse(fail(s"seed $seed refused"))
      assert(em.subject == Eml.logicalSubject(seed), s"seed $seed subject")
      assert(em.fromAddr == Eml.logicalFrom(seed), s"seed $seed from")
      val want = (0 until Eml.partCount(seed)).map(Eml.logicalPart(seed, _))
      assert(em.parts == want.toVector, s"seed $seed parts")
    }
  }

  test("plain single-part message: RFC 2045 default content type") {
    val em = extract("From: a@b.c\r\nSubject: hi\r\n\r\nplain body\r\nline two\r\n").get
    assert(em.subject == "hi" && em.fromAddr == "a@b.c")
    assert(em.parts == Vector("plain body\nline two"))
  }

  test("header folding unfolds to one space; names are case-insensitive") {
    val em = extract(
      "FROM: x@y.z\r\nSUBJECT: part one\r\n\tpart two\r\n\r\nbody").get
    assert(em.subject == "part one part two")
    assert(em.fromAddr == "x@y.z")
  }

  test("encoded-words: Q and B forms, transparent whitespace between words") {
    assert(Eml.decodeEncodedWords("=?utf-8?Q?Msg_1_=C3=A9?=") == "Msg 1 é")
    assert(Eml.decodeEncodedWords("=?iso-8859-1?Q?caf=E9?=") == "café")
    // B form: base64("héllo" UTF-8)
    val b64 = java.util.Base64.getEncoder.encodeToString("héllo".getBytes("UTF-8"))
    assert(Eml.decodeEncodedWords(s"=?utf-8?B?$b64?=") == "héllo")
    // whitespace between two encoded words vanishes; around plain text it stays
    assert(Eml.decodeEncodedWords("=?utf-8?Q?a?= =?utf-8?Q?b?=") == "ab")
    assert(Eml.decodeEncodedWords("x =?utf-8?Q?a?= y") == "x a y")
  }

  test("quoted-printable: soft breaks join, hard CRLF stays, =hh decodes") {
    val msg = "Subject: s\r\nContent-Type: text/plain; charset=windows-1252\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      "caf=E9 =80\r\nsecond so=\r\nft"
    assert(extract(msg).get.parts == Vector("café €\nsecond soft"))
  }

  test("base64 body decodes through its charset, whitespace ignored") {
    val b64 = java.util.Base64.getMimeEncoder(8, "\r\n".getBytes)
      .encodeToString("short ✓ text".getBytes("UTF-8"))
    val msg = "Subject: s\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      s"Content-Transfer-Encoding: base64\r\n\r\n$b64\r\n"
    assert(extract(msg).get.parts == Vector("short ✓ text"))
  }

  test("multipart: preamble/epilogue discarded, html twin and attachments skipped") {
    val em = Eml.extractEmail(Eml.syntheticEml(5L)).get
    val all = new String(Eml.syntheticEml(5L),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(all.contains("html twin must not leak"))
    assert(all.contains("Preamble"))
    assert(!em.parts.exists(_.contains("html twin")))
    assert(!em.parts.exists(_.contains("Preamble")))
    assert(!em.parts.exists(_.contains("Epilogue")))
  }

  test("refusal suite: unclosed boundary, bad encodings, unknown charset") {
    val openMp = "Subject: s\r\nContent-Type: multipart/mixed; boundary=b\r\n\r\n" +
      "--b\r\nContent-Type: text/plain\r\n\r\ntail part lost\r\n"
    assert(extract(openMp).isEmpty, "multipart without closing boundary")
    val badB64 = "Subject: s\r\nContent-Type: text/plain\r\n" +
      "Content-Transfer-Encoding: base64\r\n\r\n!!!!\r\n"
    assert(extract(badB64).isEmpty, "bad base64")
    val badQp = "Subject: s\r\nContent-Type: text/plain\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\nbad=Z9 escape"
    assert(extract(badQp).isEmpty, "bad QP hex")
    val badCte = "Subject: s\r\nContent-Type: text/plain\r\n" +
      "Content-Transfer-Encoding: uuencode\r\n\r\nM@5&5S=\"`A\r\n"
    assert(extract(badCte).isEmpty, "unknown transfer encoding")
    val badCs = "Subject: s\r\nContent-Type: text/plain; charset=klingon\r\n\r\nx"
    assert(extract(badCs).isEmpty, "unknown charset")
    val nonAscii = "Subject: s\r\nContent-Type: text/plain; charset=us-ascii\r\n\r\ncafé"
    assert(extract(nonAscii).isEmpty, "8-bit byte under us-ascii refuses")
    val badSubjCs = "Subject: =?x-mad?Q?a?=\r\n\r\nbody"
    assert(extract(badSubjCs).isEmpty, "unsupported encoded-word charset")
    assert(Eml.extractEmail(null).isEmpty)
    assert(Eml.extractEmail(Array.empty[Byte]).isEmpty)
  }

  test("mbox: split, mboxrd quoting round-trip, guard body survives") {
    val box = Eml.mboxWrite(Seq(
      Eml.logicalFrom(3L) -> Eml.syntheticEml(3L),
      "guard@example.org" -> Eml.guardMessage(7L)))
    val asText = new String(box, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(asText.contains("\r\n>From here\r\n"), "body From-line is quoted on the wire")
    assert(asText.contains("\r\n>>From quoted"), "already-quoted line gains one more >")
    val msgs = Eml.mboxMessages(box).get
    assert(msgs.length == 2)
    val m0 = Eml.extractEmail(msgs(0)).get
    assert(m0.subject == Eml.logicalSubject(3L))
    assert(m0.parts == (0 until Eml.partCount(3L)).map(Eml.logicalPart(3L, _)).toVector)
    val g = Eml.extractEmail(msgs(1)).get
    assert(g.subject == "Guard 7" && g.parts == Vector(Eml.logicalGuardBody))
    // refusals: not an mbox, empty
    assert(Eml.mboxMessages("To: x@y\r\n\r\nbody".getBytes).isEmpty)
    assert(Eml.mboxMessages(Array.empty[Byte]).isEmpty)
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "eml-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.eml"),
        Eml.syntheticEml(seed))
      val text = Eml.logicalSubject(seed) + " " +
        Eml.logicalFrom(seed) + " " +
        (0 until Eml.partCount(seed)).map(Eml.logicalPart(seed, _)).mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        text.getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.eml")))
  }
}
