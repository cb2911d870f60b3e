package graft

import graft.ops.Pdf
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Pdf]]: the from-scratch PDF text extractor against its
  * fixture generator — closed-form round-trips across every encoder path
  * (compressed/raw, direct/indirect Length, all four show forms, all
  * line-move forms, escapes, hex strings) plus corrupt-input refusal.
  * Also dumps fixtures for `tools/check_pdf_fixture.py`, the independent
  * Python mirror (zero shared code with either the writer or the
  * extractor).
  */
class PdfSpec extends AnyFunSuite {

  test("extractText round-trips logicalText for 120 seeds") {
    (0L until 120L).foreach { seed =>
      val pages = Pdf.extractText(Pdf.syntheticPdf(seed))
        .getOrElse(fail(s"seed $seed: extraction refused"))
      assert(pages.size === 1 + (seed % 2).toInt, s"seed $seed page count")
      assert(pages.mkString("\n") === Pdf.logicalText(seed), s"seed $seed")
    }
  }

  test("escape and hex paths are load-bearing (seed picks with each suffix)") {
    // seed 0: 5-divisible AND 7-divisible line 0 -> both suffixes; also
    // compressed + indirect length
    val t0 = Pdf.logicalText(0L)
    assert(t0.contains(" (x\\y)A") || t0.contains("(x\\y)"), t0)
    assert(Pdf.extractText(Pdf.syntheticPdf(0L)).get.mkString("\n") === t0)
    // an odd, non-multiple-of-3 seed: raw streams, direct length
    val t7 = Pdf.logicalText(7L)
    assert(Pdf.extractText(Pdf.syntheticPdf(7L)).get.mkString("\n") === t7)
  }

  test("hex strings with an odd digit count get the implicit trailing zero") {
    // hand-built one-page PDF via the fixture, then check a standalone
    // content stream through the public path: <48454C50> vs <48454C5>
    // ('HELP' vs 'HEL' + 'P'&0xF0='P'): build minimal docs around both
    def onePage(content: String): Array[Byte] = {
      val raw = s"BT /F1 9 Tf $content ET".getBytes("ISO-8859-1")
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      val off = new Array[Int](7)
      def obj(n: Int)(b: => Unit): Unit = { off(n) = out.size(); w(s"$n 0 obj\n"); b; w("endobj\n") }
      w("%PDF-1.4\n")
      obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
      // /Resources lives on the PAGES node here — inheritance path
      obj(2)(w("<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 5 0 R >> >> >>\n"))
      obj(3)(w("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"))
      obj(4) { w(s"<< /Length ${raw.length} >>\nstream\n"); out.write(raw); w("\nendstream\n") }
      obj(5)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
      val x = out.size()
      w("xref\n0 6\n0000000000 65535 f \n")
      (1 to 5).foreach(n => w(f"${off(n)}%010d 00000 n \n"))
      w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
      out.toByteArray
    }
    assert(Pdf.extractText(onePage("<48454C50> Tj")).get === Vector("HELP"))
    assert(Pdf.extractText(onePage("<48454C5> Tj")).get === Vector("HELP"))
    // balanced unescaped parens inside a literal string are legal
    assert(Pdf.extractText(onePage("(a(b)c) Tj")).get === Vector("a(b)c"))
    // consecutive line moves collapse to one newline; leading move emits none
    assert(Pdf.extractText(onePage("0 0 Td T* (a) Tj T* 0 -14 Td (b) Tj"))
      .get === Vector("a\nb"))
  }

  test("PDF routes through the media vocabulary: media_kind = pdf, exact counts") {
    val bytes = Pdf.syntheticPdf(3L)
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(bytes)
    assert(kind === "pdf")
    val text = Pdf.logicalText(3L)
    assert(feats.toSeq === Seq(2f, (1 + text.count(_ == '\n')).toFloat,
      text.length.toFloat))
    // non-PDF bytes still fall through to the stub
    assert(graft.ops.Multimodal.decodeWithKind("plain".getBytes)._1 === "stub")
  }

  test("seed%5==0 writes the PDF 1.5 layout (xref stream + ObjStm) and round-trips") {
    val modern = Pdf.syntheticPdf(5L) // odd: raw streams, readable dicts
    val s = new String(modern, "ISO-8859-1")
    assert(s.startsWith("%PDF-1.5") && s.contains("/Type /XRef") &&
      s.contains("/Type /ObjStm") && !s.contains("trailer"),
      "modern layout must carry xref + object streams and no classic trailer")
    assert(Pdf.extractText(modern).get.mkString("\n") === Pdf.logicalText(5L))
    // compressed variant (seed 0: even AND %5==0) round-trips too — and
    // every tenth seed's xref stream is PNG-Up-predicted + deflated,
    // the layout real writers emit
    val s0 = new String(Pdf.syntheticPdf(0L), "ISO-8859-1")
    assert(s0.startsWith("%PDF-1.5") && s0.contains("/Filter /FlateDecode"))
    assert(s0.contains("/Predictor 12"))
    assert(Pdf.extractText(Pdf.syntheticPdf(10L)).get.mkString("\n") ===
      Pdf.logicalText(10L), "predictor'd xref stream round-trips")
    assert(!new String(Pdf.syntheticPdf(5L), "ISO-8859-1").contains("/Predictor"),
      "non-tenth modern seeds keep the raw xref stream")
    // classic seeds stay 1.4
    assert(new String(Pdf.syntheticPdf(1L), "ISO-8859-1").startsWith("%PDF-1.4"))
    // a truncated xref stream refuses loudly
    val cut = java.util.Arrays.copyOf(modern, modern.length - 40)
    assert(Pdf.extractText(cut).isEmpty)
  }

  test("corrupt modern-layout structures refuse instead of crashing") {
    // mangle the predictor'd xref stream payload (seed 10) — locate the
    // payload via ">>\nstream\n" (a bare "stream\n" search would match
    // inside "endstream")
    val pred = Pdf.syntheticPdf(10L)
    val s = new String(pred, "ISO-8859-1")
    val at = s.lastIndexOf(">>\nstream\n") + 10
    val mut = pred.clone(); mut(at) = (mut(at) ^ 0x7f).toByte
    assert(Pdf.extractText(mut).isEmpty ||
      Pdf.extractText(mut).get.mkString("\n") != Pdf.logicalText(10L))
    // mangle the ObjStm payload of a RAW modern file (seed 5): its
    // stream is the FIRST one in the file
    val modern = Pdf.syntheticPdf(5L)
    val ms = new String(modern, "ISO-8859-1")
    val stmAt = ms.indexOf(">>\nstream\n") + 10
    val mut2 = modern.clone(); mut2(stmAt) = '@'.toByte
    val out2 = Pdf.extractText(mut2)
    assert(out2.isEmpty || out2.get.mkString("\n") != Pdf.logicalText(5L))
  }

  test("corrupt inputs refuse instead of crashing") {
    assert(Pdf.extractText(null).isEmpty)
    assert(Pdf.extractText("not a pdf at all".getBytes).isEmpty)
    val good = Pdf.syntheticPdf(1L)
    // truncation kills the xref table
    assert(Pdf.extractText(java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    // dangling startxref offset
    val s = new String(good, "ISO-8859-1")
    val broken = s.replaceAll("startxref\n\\d+", "startxref\n99999999")
    assert(Pdf.extractText(broken.getBytes("ISO-8859-1")).isEmpty)
    // corrupt a compressed stream's bytes (seed 2: compressed)
    val comp = Pdf.syntheticPdf(2L)
    val idx = new String(comp, "ISO-8859-1").indexOf("stream\n") + 10
    val mut = comp.clone(); mut(idx) = (mut(idx) ^ 0x55).toByte
    // either flate refuses or the text no longer matches; must not throw
    val out = Pdf.extractText(mut)
    assert(out.isEmpty || out.get.mkString("\n") != Pdf.logicalText(2L))
  }

  test("a malformed /ToUnicode on an UNUSED font does not refuse the doc (ADVICE r12)") {
    // two fonts in /Resources: F1 plain Type1, F2 with a /ToUnicode CMap
    // whose bfchar src code is 5 bytes wide (parse error). The CMap must
    // only be parsed when a show decodes THROUGH F2 — defining it is free.
    def doc(content: String): Array[Byte] = {
      val raw = content.getBytes("ISO-8859-1")
      val cmap = "1 beginbfchar <4141414141> <0041> endbfchar".getBytes("ISO-8859-1")
      val out = new java.io.ByteArrayOutputStream()
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      val off = new Array[Int](9)
      def obj(n: Int)(b: => Unit): Unit = { off(n) = out.size(); w(s"$n 0 obj\n"); b; w("endobj\n") }
      w("%PDF-1.4\n")
      obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>\n"))
      obj(2)(w("<< /Type /Pages /Kids [3 0 R] /Count 1 " +
        "/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>\n"))
      obj(3)(w("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"))
      obj(4) { w(s"<< /Length ${raw.length} >>\nstream\n"); out.write(raw); w("\nendstream\n") }
      obj(5)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"))
      obj(6)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Broken /ToUnicode 7 0 R >>\n"))
      obj(7) { w(s"<< /Length ${cmap.length} >>\nstream\n"); out.write(cmap); w("\nendstream\n") }
      val x = out.size()
      w("xref\n0 8\n0000000000 65535 f \n")
      (1 to 7).foreach(n => w(f"${off(n)}%010d 00000 n \n"))
      w(s"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
      out.toByteArray
    }
    // F2 never shows: the broken CMap must not reject the document
    assert(Pdf.extractText(doc("BT /F1 9 Tf (fine) Tj ET")).get === Vector("fine"))
    // the SAME font, actually used: refuse at the show, not silently pass
    assert(Pdf.extractText(doc("BT /F2 9 Tf (A) Tj ET")).isEmpty)
  }

  test("Type0 seeds decode glyph ids through the /ToUnicode CMap") {
    // seed 2: 1.4 layout, %3==2 -> odd lines show 2-byte gids under /F2;
    // seed 5 and 20: the SAME font variant under the 1.5 layout. The
    // round-trip only holds if Tf is tracked and the CMap applied.
    Seq(2L, 5L, 8L, 20L, 23L).foreach { seed =>
      assert(Pdf.extractText(Pdf.syntheticPdf(seed)).get.mkString("\n")
        === Pdf.logicalText(seed), s"seed $seed")
    }
    // the CMap parser itself: bfchar overrides inside a bfrange domain
    val m = Pdf.parseToUnicode(Pdf.toUnicodeCMap.getBytes("ISO-8859-1"))
    assert(m(0x0041) === "A", "bfchar entry")
    assert(m(0x0120) === " " && m(0x017e) === "~", "bfrange endpoints")
    assert(m(0x0141) === "A", "range interior")
    // the ARRAY-destination bfrange form (explicit dst per code), and a
    // multi-code-unit destination (ligature expansion: one gid -> "fi")
    val arr = Pdf.parseToUnicode(
      ("1 beginbfrange <0001> <0003> [<0041> <0042> <0043>] endbfrange " +
        "1 beginbfchar <0010> <00660069> endbfchar").getBytes("ISO-8859-1"))
    assert(arr(1) === "A" && arr(2) === "B" && arr(3) === "C")
    assert(arr(0x10) === "fi", "multi-unit UTF-16BE dst")
  }

  test("Type0 without a usable /ToUnicode refuses at the first show") {
    val good = Pdf.syntheticPdf(2L) // Type0 variant, 1.4 layout
    val s = new String(good, "ISO-8859-1")
    // same-length surgeries keep every xref offset valid, so the ONLY
    // failure mode left is the font refusal itself
    val noMap = s.replace("/ToUnicode 5 0 R", "/ToUnicodX 5 0 R")
    assert(Pdf.extractText(noMap.getBytes("ISO-8859-1")).isEmpty,
      "Type0 with no /ToUnicode must refuse, not mojibake")
    val badEnc = s.replace("/Identity-H", "/Identity-X")
    assert(Pdf.extractText(badEnc.getBytes("ISO-8859-1")).isEmpty,
      "non-Identity-H Type0 must refuse")
    // a NON-Type0 seed is untouched by the same surgery (no /F2 use)
    val plain = new String(Pdf.syntheticPdf(1L), "ISO-8859-1")
      .replace("/ToUnicode 5 0 R", "/ToUnicodX 5 0 R")
    assert(Pdf.extractText(plain.getBytes("ISO-8859-1")).get.mkString("\n")
      === Pdf.logicalText(1L), "unused broken font never fires")
  }

  /** Minimal hand-rolled PDF: objects as raw body strings, exact xref. */
  private def tinyPdf(objs: Seq[String], trailerExtra: String = ""): Array[Byte] = {
    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.length
      out.append(s"${i + 1} 0 obj\n$body\nendobj\n")
      off
    }
    val xrefOff = out.length
    out.append(s"xref\n0 ${objs.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => out.append(f"$o%010d 00000 n \n"))
    out.append(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R$trailerExtra >>\n")
    out.append(s"startxref\n$xrefOff\n%%EOF\n")
    out.toString.getBytes("ISO-8859-1")
  }

  test("encrypted fixtures (empty user password) decrypt for all three modes") {
    // seed%11 picks the handler: 4 → RC4-40 (V1/R2), 7 → RC4-128
    // (V2/R3), 9 → AES-128 (V4/R4 /AESV2); %5==0 / %7==3 stay excluded
    for (mode <- 1 to 3) {
      val seed = (1L until 200L).find(sd => Pdf.encMode(sd) == mode).get
      assert(Pdf.extractText(Pdf.syntheticPdf(seed)).get.mkString("\n")
        === Pdf.logicalText(seed), s"mode $mode seed $seed")
    }
    // ciphertext really is opaque: an odd (uncompressed) encrypted seed
    // must not leak its show strings in the raw bytes
    val s37 = (1L until 300L).find(sd =>
      Pdf.encMode(sd) > 0 && sd % 2 == 1 && sd % 3 != 2).get
    val raw = new String(Pdf.syntheticPdf(s37), "ISO-8859-1")
    assert(!raw.contains(" line "), "content must be encrypted, not plaintext")
    assert(Pdf.extractText(Pdf.syntheticPdf(s37)).get.mkString("\n")
      === Pdf.logicalText(s37))
  }

  test("non-empty passwords and unsupported handlers refuse, never mojibake") {
    val seed = (1L until 200L).find(sd => Pdf.encMode(sd) == 2).get
    val good = new String(Pdf.syntheticPdf(seed), "ISO-8859-1")
    assert(Pdf.extractText(good.getBytes("ISO-8859-1")).isDefined)
    // flip a /U hex digit: the empty user password no longer verifies —
    // this doc NEEDS a real password, so it must refuse
    val uAt = good.indexOf("/U <")
    assert(uAt > 0)
    val c = good.charAt(uAt + 4)
    val flipped = good.substring(0, uAt + 4) +
      (if (c == 'A') 'B' else 'A') + good.substring(uAt + 5)
    assert(Pdf.extractText(flipped.getBytes("ISO-8859-1")).isEmpty,
      "wrong user password must refuse")
    // an unsupported crypt filter refuses loudly
    val aesSeed = (1L until 200L).find(sd => Pdf.encMode(sd) == 3).get
    val aes = new String(Pdf.syntheticPdf(aesSeed), "ISO-8859-1")
    assert(Pdf.extractText(
      aes.replace("/CFM /AESV2", "/CFM /AESV3").getBytes("ISO-8859-1")).isEmpty)
    // a non-Standard handler refuses
    assert(Pdf.extractText(
      good.replace("/Filter /Standard", "/Filter /Graftish").getBytes("ISO-8859-1")).isEmpty)
  }

  test("incremental updates: /Prev xref chains resolve, newest revision wins") {
    // seed%7==3 (and %5!=0) appends a revision: page 0's true content
    // lands AFTER the first %%EOF with a one-entry xref chaining back
    Seq(3L, 17L, 24L, 38L).foreach { seed =>
      val bytes = Pdf.syntheticPdf(seed)
      val s = new String(bytes, "ISO-8859-1")
      assert("startxref".r.findAllIn(s).length === 2, s"seed $seed: two sections")
      assert(s.contains("stale revision"), s"seed $seed: stale body present")
      assert(s.contains("/Prev "), s"seed $seed")
      val text = Pdf.extractText(bytes).get.mkString("\n")
      assert(text === Pdf.logicalText(seed), s"seed $seed: newest revision wins")
      assert(!text.contains("stale"), s"seed $seed")
    }
    // a /Prev loop (trailer pointing at its own section) is DATA
    val bytes = Pdf.syntheticPdf(3L)
    val s = new String(bytes, "ISO-8859-1")
    val x2 = s.substring(s.lastIndexOf("startxref\n") + 10).trim
      .takeWhile(_.isDigit)
    val looped = s.replaceFirst("/Prev \\d+", s"/Prev $x2")
    assert(Pdf.extractText(looped.getBytes("ISO-8859-1")).isEmpty,
      "a /Prev cycle must refuse, not hang")
  }

  test("adversarial reference cycles are DATA, not a StackOverflowError") {
    // obj 2 -> 3 0 R, obj 3 -> 2 0 R: a pure indirect-reference loop on
    // the /Pages resolution path (ADVICE r11) — loops through the cache,
    // so only the resolve-chain guard can see it
    val refCycle = tinyPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>", "3 0 R", "2 0 R"))
    assert(Pdf.extractText(refCycle).isEmpty)
    // a /Kids array naming its own node: recurses through resolved
    // DICTS — caught by the page-tree depth bound
    val kidsCycle = tinyPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [2 0 R] /Count 1 >>"))
    assert(Pdf.extractText(kidsCycle).isEmpty)
    // a stream whose /Length is an indirect ref back to ITSELF: the
    // parse re-enters obj(n) mid-parse — the parsing-set guard
    val lenCycle = tinyPdf(Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      "<< /Length 4 0 R >>\nstream\nBT ET\nendstream"))
    assert(Pdf.extractText(lenCycle).isEmpty)
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "pdf-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.pdf"),
        Pdf.syntheticPdf(seed))
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        Pdf.logicalText(seed).getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.pdf")))
  }
}
