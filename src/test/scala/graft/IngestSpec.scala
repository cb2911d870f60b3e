package graft

import graft.ops.Ingest
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** Archive-ingestion layer: codec round-trips, RFC 1952 member framing,
  * ISO 28500 WARC parsing, and the DataFrame operators' error channels.
  */
class IngestSpec extends AnyFunSuite {

  private val codecs = Seq("gzip", "zstd", "bzip2", "xz", "lz4")

  test("every codec round-trips arbitrary bytes and sniffs correctly") {
    // deterministic samples (scalatest+scalacheck bridge is not in the
    // offline cache — the GeoSpec pattern): sizes spanning empty, tiny,
    // block-boundary, and incompressible-random payloads
    val rnd = new scala.util.Random(42)
    val samples: Seq[Array[Byte]] =
      Seq(Array.empty[Byte], Array[Byte](0), "abc".getBytes(UTF_8),
        Array.fill[Byte](100000)(7)) ++
        Seq(17, 1024, 65537).map { n =>
          val a = new Array[Byte](n); rnd.nextBytes(a); a
        }
    samples.foreach { raw =>
      codecs.foreach { c =>
        val packed = Ingest.compress(raw, c)
        assert(Ingest.sniffCodec(packed).contains(c), s"sniff $c")
        val out = Ingest.decompress(packed)
        assert(out.isDefined && out.get._1 == c)
        assert(java.util.Arrays.equals(out.get._2, raw), s"roundtrip $c n=${raw.length}")
      }
    }
  }

  test("decompress is a soft error channel: garbage and truncation give None") {
    assert(Ingest.decompress("plain text, no magic".getBytes(UTF_8)).isEmpty)
    assert(Ingest.decompress(Array.empty[Byte]).isEmpty)
    codecs.foreach { c =>
      val packed = Ingest.compress("some document body".getBytes(UTF_8), c)
      val truncated = java.util.Arrays.copyOf(packed, packed.length / 2)
      // truncated streams must not throw — a 100 TB crawl always has some
      assert(Ingest.decompress(truncated).isEmpty, s"truncated $c")
    }
  }

  test("gzipMembers splits record-at-time concatenation and verifies CRC") {
    val recs = (0 until 7).map(i => s"record $i body ${"x" * i}".getBytes(UTF_8))
    val packed = Ingest.gzipConcat(recs)
    val out = Ingest.gzipMembers(packed)
    assert(out.size == 7)
    out.zip(recs).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }

    // single member == GZIPInputStream's own view of the same bytes
    val one = Ingest.gzipMembers(Ingest.gzipConcat(Seq(recs.head)))
    assert(one.size == 1 && java.util.Arrays.equals(one.head, recs.head))

    // flipped payload bit -> CRC mismatch must be LOUD (framing primitive
    // throws; the DataFrame operator is the soft layer)
    val corrupt = packed.clone()
    corrupt(packed.length / 2) = (corrupt(packed.length / 2) ^ 0x40).toByte
    intercept[IllegalArgumentException](Ingest.gzipMembers(corrupt))
    intercept[IllegalArgumentException](
      Ingest.gzipMembers(java.util.Arrays.copyOf(packed, packed.length - 3)))
  }

  test("gzipMembers handles optional header fields (FNAME/FEXTRA/FHCRC)") {
    // hand-build a member with FNAME + FHCRC around a raw-deflate payload
    val payload = "named member".getBytes(UTF_8)
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(payload); deflater.finish()
    val comp = new Array[Byte](payload.length + 64)
    val n = deflater.deflate(comp); deflater.end()
    val head = new java.io.ByteArrayOutputStream()
    head.write(Array(0x1f, 0x8b, 8, 8).map(_.toByte)) // FLG = FNAME
    head.write(new Array[Byte](6))                    // mtime/xfl/os
    head.write("doc.txt".getBytes(UTF_8)); head.write(0)
    head.write(comp, 0, n)
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    val tail = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt).putInt(payload.length).array()
    head.write(tail)
    val out = Ingest.gzipMembers(head.toByteArray)
    assert(out.size == 1 && java.util.Arrays.equals(out.head, payload))
  }

  test("gzipMembers: truncation INSIDE optional headers throws the documented IAE") {
    // FNAME declared but the name never hits its NUL terminator
    val noNul = Array(0x1f, 0x8b, 8, 8, 0, 0, 0, 0, 0, 0, 'a', 'b', 'c').map(_.toByte)
    val e1 = intercept[IllegalArgumentException](Ingest.gzipMembers(noNul))
    assert(e1.getMessage.contains("truncated header"))
    // FEXTRA declared but only one of its two xlen bytes present
    val shortExtra = Array(0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0, 0x10).map(_.toByte)
    val e2 = intercept[IllegalArgumentException](Ingest.gzipMembers(shortExtra))
    assert(e2.getMessage.contains("truncated header"))
    // FEXTRA length field pointing past the end of the buffer
    val longExtra = Array(0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0, 0xff, 0x7f).map(_.toByte)
    val e3 = intercept[IllegalArgumentException](Ingest.gzipMembers(longExtra))
    assert(e3.getMessage.contains("truncated header"))
  }

  test("WARC record round-trip, case-insensitive headers, exact Content-Length") {
    val body = "body with \r\n\r\n separator INSIDE payload".getBytes(UTF_8)
    val rec = Ingest.WarcRecord("response", Some("https://example.com/a/1"),
      Some("<urn:uuid:1>"), Some("application/http; msgtype=response"), body)
    val parsed = Ingest.parseWarcRecord(Ingest.writeWarcRecord(rec))
    assert(parsed.isDefined)
    assert(parsed.get.warcType == "response")
    assert(parsed.get.targetUri.contains("https://example.com/a/1"))
    // Content-Length exact: the embedded CRLFCRLF inside the payload must
    // NOT truncate it — the classic scan-for-separator corruption bug
    assert(java.util.Arrays.equals(parsed.get.payload, body))

    val lower = new String(Ingest.writeWarcRecord(rec), UTF_8)
      .replace("WARC-Type", "warc-type").replace("Content-Length", "CONTENT-LENGTH")
    assert(Ingest.parseWarcRecord(lower.getBytes(UTF_8)).exists(_.warcType == "response"))

    assert(Ingest.parseWarcRecord("not a warc".getBytes(UTF_8)).isEmpty)
    assert(Ingest.parseWarcRecord("WARC/1.0\r\nContent-Length: 999\r\n\r\nshort"
      .getBytes(UTF_8)).isEmpty)
  }

  test("stripHttpEnvelope returns status + exact body") {
    val body = "héllo wörld".getBytes(UTF_8)
    val payload = "HTTP/1.1 404 Not Found\r\nX-H: 1\r\n\r\n".getBytes(UTF_8) ++ body
    val out = Ingest.stripHttpEnvelope(payload)
    assert(out.exists(_._1 == 404))
    assert(java.util.Arrays.equals(out.get._2, body))
    assert(Ingest.stripHttpEnvelope("no envelope".getBytes(UTF_8)).isEmpty)
  }

  test("decompressText operator: five codecs + NULL row for corrupt blobs") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val texts = (0L until 25L).map(i => i -> s"document $i ${"pad" * (i % 7).toInt}")
    val rows = texts.map { case (id, t) =>
      Row(id, Ingest.compress(t.getBytes(UTF_8), codecs((id % 5).toInt)))
    } :+ Row(99L, "not compressed".getBytes(UTF_8))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("id", LongType), StructField("blob", BinaryType))))
    val out = Ingest.decompressText(df, "id", "blob").collect().map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, t) =>
      assert(out(id).getString(1) == codecs((id % 5).toInt))
      assert(out(id).getLong(2) == t.getBytes(UTF_8).length)
      assert(out(id).getString(3) == "utf-8")
      assert(out(id).getString(4) == t)
    }
    assert(out(99L).isNullAt(1) && out(99L).isNullAt(4))
    // archived pages with a BOM or an in-page declaration decode through
    // the same sniff as the HTTP path
    val bomText = "bom çafé"
    val bomBlob = Ingest.compress(
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ bomText.getBytes(UTF_8), "gzip")
    val metaHtml = "<meta charset=\"windows-1252\"><p>€ offer</p>"
    val metaBlob = Ingest.compress(
      metaHtml.getBytes(java.nio.charset.Charset.forName("windows-1252")), "zstd")
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, bomBlob), Row(2L, metaBlob))),
      StructType(Seq(StructField("id", LongType), StructField("blob", BinaryType))))
    val out2 = Ingest.decompressText(df2, "id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out2(1L).getString(3) == "utf-8" && out2(1L).getString(4) == bomText)
    assert(out2(2L).getString(3) == "windows-1252" && out2(2L).getString(4) == metaHtml)
  }

  test("warcIngest operator: member order preserved, non-response skipped, bad file -> 0 rows") {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def response(id: Long, text: String): Array[Byte] = {
      val body = text.getBytes(UTF_8)
      val http = s"HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8) ++ body
      Ingest.writeWarcRecord(Ingest.WarcRecord("response",
        Some(s"https://x.test/$id"), Some(s"<urn:uuid:$id>"),
        Some("application/http; msgtype=response"), http))
    }
    val info = Ingest.writeWarcRecord(Ingest.WarcRecord("warcinfo", None,
      Some("<urn:uuid:info>"), Some("application/warc-fields"),
      "software: test\r\n".getBytes(UTF_8)))
    val request = Ingest.writeWarcRecord(Ingest.WarcRecord("request",
      Some("https://x.test/9"), None, None, "GET / HTTP/1.1\r\n\r\n".getBytes(UTF_8)))
    val good = Ingest.gzipConcat(Seq(info, response(3, "three"), request, response(1, "one")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, good), Row(1L, "rubbish".getBytes(UTF_8))), 2),
      StructType(Seq(StructField("file", LongType), StructField("blob", BinaryType))))
    val out = Ingest.warcIngest(df, "file", "blob").collect()
    assert(out.length == 2) // warcinfo + request filtered, bad file dropped
    assert(out.map(_.getString(1)).toSeq == Seq("https://x.test/3", "https://x.test/1"))
    assert(out.map(_.getString(5)).toSeq == Seq("three", "one"))
    assert(out.forall(_.getString(4) == "utf-8")) // no declaration → fallback
    assert(out.forall(_.getInt(2) == 200))
  }

  test("parseHttpResponse surfaces the Content-Type header, case-insensitively") {
    val payload = ("HTTP/1.1 200 OK\r\nx-a: 1\r\ncOnTeNt-TyPe: text/html;" +
      " charset=ISO-8859-1\r\n\r\nbody").getBytes(UTF_8)
    val (st, ct, body) = Ingest.parseHttpResponse(payload).get
    assert(st == 200 && ct.contains("text/html; charset=ISO-8859-1"))
    assert(new String(body, UTF_8) == "body")
    // obs-fold (RFC 7230 §3.2.4): a continuation line starting with SP/HTAB
    // extends the previous header — the folded charset parameter survives
    val folded = ("HTTP/1.1 200 OK\r\nContent-Type: text/html;\r\n" +
      "\tcharset=GBK\r\nx-b: 2\r\n\r\nbody").getBytes(UTF_8)
    val (st2, ct2, _) = Ingest.parseHttpResponse(folded).get
    assert(st2 == 200 && ct2.contains("text/html; charset=GBK"))
  }

  test("charset resolution: header > meta prescan > utf-8; BOM beats everything") {
    import java.nio.charset.Charset
    def cs(ct: Option[String], body: Array[Byte]) =
      Ingest.resolveCharset(ct, body).name()
    // header param, quoted and aliased labels normalize — the WHATWG label
    // table maps the whole latin1/ascii family to windows-1252 (browsers
    // never decode true ISO-8859-1; bytes 0x80-0x9F are euro/smart-quotes)
    assert(cs(Some("text/plain; charset=latin1"), Array[Byte]()) == "windows-1252")
    assert(cs(Some("text/plain; charset=ISO-8859-1"), Array[Byte]()) == "windows-1252")
    assert(cs(Some("text/plain; charset=US-ASCII"), Array[Byte]()) == "windows-1252")
    assert(cs(Some("text/html; charset=\"GBK\""), Array[Byte]()) == "GBK")
    // no header → meta prescan, both declaration shapes
    val meta1 = "<html><head><meta charset='windows-1252'></head>".getBytes(UTF_8)
    assert(cs(Some("text/html"), meta1) == "windows-1252")
    val meta2 = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=gbk\"></head>").getBytes(UTF_8)
    assert(cs(None, meta2) == "GBK")
    // meta outside the 1024-byte prescan window is invisible
    val late = (" " * 1100 + "<meta charset=gbk>").getBytes(UTF_8)
    assert(cs(None, late) == "UTF-8")
    // the prescan skips comments (WHATWG): a commented-out meta never
    // selects; a live one after the comment still does
    val commented = "<!-- <meta charset=gbk> --><p>x</p>".getBytes(UTF_8)
    assert(cs(None, commented) == "UTF-8")
    val after = "<!-- <meta charset=gbk> --><meta charset=latin1>".getBytes(UTF_8)
    assert(cs(None, after) == "windows-1252")
    // attribute-aware prescan: 'charset=' inside an unrelated attribute
    // value is NOT a declaration (the WHATWG prescan parses attributes)
    val decoy = ("<meta name=\"description\" content=\"charset=koi8-r\">"
      ).getBytes(UTF_8)
    assert(cs(None, decoy) == "UTF-8")
    val decoyThenReal = ("<meta name=d content=\"charset=koi8-r\">" +
      "<meta http-equiv=Content-Type content=\"text/html; charset=gbk\">").getBytes(UTF_8)
    assert(cs(None, decoyThenReal) == "GBK")
    // the prescan resumes past the consumed tag's closing '>' (WHATWG): a
    // '<meta' LITERAL inside a quoted attribute value is part of the
    // consumed tag and must never re-parse as a real tag
    val nested = "<meta name=x content=\"<meta charset=gbk>\">".getBytes(UTF_8)
    assert(cs(None, nested) == "UTF-8")
    val nestedThenReal = ("<meta name=x content=\"<meta charset=gbk>\">" +
      "<meta charset=latin1>").getBytes(UTF_8)
    assert(cs(None, nestedThenReal) == "windows-1252")
    // meta-declared UTF-16 is self-contradictory in a byte prescan → UTF-8
    // (HTML spec's extraction rule); header-declared UTF-16 is honored
    assert(cs(None, "<meta charset=utf-16>".getBytes(UTF_8)) == "UTF-8")
    assert(cs(Some("text/plain; charset=utf-16be"), Array[Byte]()) == "UTF-16BE")
    // <metax …> is not a meta tag
    assert(cs(None, "<metax charset=gbk>".getBytes(UTF_8)) == "UTF-8")
    // an unresolvable label does NOT end the prescan (WHATWG: failure to
    // get an encoding continues scanning) — the next declaration wins
    val bogusThenReal = "<meta charset=bogus><meta charset=gbk>".getBytes(UTF_8)
    assert(cs(None, bogusThenReal) == "GBK")
    // an UNCLOSED comment swallows the rest of the window
    val unclosed = "<!-- <meta charset=gbk>".getBytes(UTF_8)
    assert(cs(None, unclosed) == "UTF-8")
    // garbage labels degrade to the next layer, never throw
    assert(cs(Some("text/html; charset=not-a-charset"), meta1) == "windows-1252")
    assert(cs(Some("text/html; charset=bogus"), Array[Byte]()) == "UTF-8")
    // a BOM overrides even an explicit (wrong) header declaration
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "x".getBytes(UTF_8)
    assert(cs(Some("text/plain; charset=latin1"), bom) == "UTF-8")
    assert(cs(None, Array[Byte](0xfe.toByte, 0xff.toByte)) == "UTF-16BE")
    assert(cs(None, Array[Byte](0xff.toByte, 0xfe.toByte)) == "UTF-16LE")
  }

  test("decodeHttpBody: non-UTF-8 wire bytes round-trip; BOM stripped; bad bytes degrade") {
    import java.nio.charset.Charset
    val text = "déjà vu — € “q” 中文"
    // (declared label, charset it actually decodes under — latin1-family
    // labels resolve to windows-1252 per the WHATWG table)
    for ((label, canon) <- Seq("iso-8859-1" -> "windows-1252",
      "windows-1252" -> "windows-1252", "gbk" -> "gbk", "utf-8" -> "utf-8")) {
      val c = Charset.forName(canon)
      val enc = c.encode(text) // unencodable chars become '?' — fine, we
      val wire = new Array[Byte](enc.remaining()); enc.get(wire) // compare decoded-vs-decoded
      val expected = new String(wire, c)
      val (got, used) = Ingest.decodeHttpBody(wire,
        Some(s"text/plain; charset=$label"))
      assert(used == canon && got == expected, label)
    }
    // an iso-8859-1-LABELED page with a 0x80 byte decodes to € (cp1252),
    // not the C1 control U+0080 — the behavior real browsers ship
    val euro = "price: ".getBytes(Charset.forName("us-ascii")) ++ Array(0x80.toByte)
    val (eTxt, eCs) = Ingest.decodeHttpBody(euro, Some("text/html; charset=iso-8859-1"))
    assert(eCs == "windows-1252" && eTxt == "price: €")
    // UTF-8 BOM never surfaces as U+FEFF content
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "hi".getBytes(UTF_8)
    assert(Ingest.decodeHttpBody(bom, None) == (("hi", "utf-8")))
    // malformed UTF-8 decodes with U+FFFD, never throws
    val bad = Array[Byte](0x68, 0xC3.toByte, 0x28)
    val (s2, _) = Ingest.decodeHttpBody(bad, None)
    assert(s2.contains('�') && s2.startsWith("h"))
  }

  test("ARC: record round-trip, version block, declared-length honesty") {
    import graft.ops.Ingest
    val rec = Ingest.ArcRecord("https://example.com/a/1", "203.0.113.7",
      "20120101000003", "text/html", "HTTP/1.1 200 OK\r\n\r\nbody".getBytes("UTF-8"))
    val bytes = Ingest.writeArcRecord(rec)
    val back = Ingest.parseArcRecord(bytes).get
    assert(back.url == rec.url && back.ip == rec.ip && back.date == rec.date)
    assert(java.util.Arrays.equals(back.payload, rec.payload))
    // declared length honored EXACTLY: a lying length refuses
    val lying = new String(bytes, "ISO-8859-1")
      .replaceFirst(" (\\d+)\\n", " 99999\n")
      .getBytes("ISO-8859-1")
    assert(Ingest.parseArcRecord(lying).isEmpty)
    // header fields are space-delimited single-line: spaces refuse at write
    intercept[IllegalArgumentException] {
      Ingest.writeArcRecord(rec.copy(contentType = "text/html; charset=utf-8"))
    }
    // the version block parses as a filedesc:// record with a v1 payload
    val ver = Ingest.parseArcRecord(
      Ingest.writeArcVersionBlock("f.arc", "20120101000000")).get
    assert(ver.url == "filedesc://f.arc")
    assert(new String(ver.payload, "US-ASCII").startsWith("1 0 "))
    assert(Ingest.parseArcRecord("not an arc header".getBytes).isEmpty)
    assert(Ingest.parseArcRecord(Array.empty[Byte]).isEmpty)
  }
}
