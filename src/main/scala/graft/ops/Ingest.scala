package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion: compressed-blob decode and WARC record extraction.
  *
  * A 100 TB text pipeline does not start from parquet — it starts from
  * Common-Crawl-shaped archives: `.warc.gz` files whose records are
  * individually gzip-compressed and concatenated (ISO 28500 §"record-at-
  * time compression"), and sibling corpora shipped as zstd / bzip2 / xz /
  * lz4 streams. This module supplies that first mile as proper Spark
  * operators:
  *
  *  - [[decompress]] — codec auto-detection by magic bytes + streaming
  *    decode through REAL codecs: gzip/zlib via `java.util.zip` (JDK),
  *    zstd via zstd-jni, bzip2/xz/framed-lz4 via commons-compress — all
  *    libraries Spark itself ships for shuffle/parquet compression, so
  *    the 100 TB cluster has them by construction.
  *  - [[gzipMembers]] — RFC 1952 member-boundary walk (header parse +
  *    raw-Inflater byte accounting + CRC32/ISIZE verification per member),
  *    the split a WARC reader needs because `GZIPInputStream` silently
  *    concatenates members and loses record framing.
  *  - [[parseWarcRecords]] — ISO 28500 header block parse (version line,
  *    case-insensitive named headers, Content-Length-exact payload) with
  *    the HTTP envelope stripped from `response` records.
  *
  * Scale shape: ingestion is `mapPartitions` over (file, blob) rows — pure
  * per-row CPU, zero shuffle; the parallel unit is the archive file,
  * exactly how the real corpus is laid out (CC segments are ~1 GB .warc.gz
  * files, ~64k per crawl). Nothing here buffers more than one record.
  *
  * Reference scope: the reference engine ingests via DuckDB's read_text/
  * read_blob + gzip (`duckdb/extension/parquet`, httpfs) — this module is
  * the Spark-native widening of that surface to the archive formats the
  * training-data world uses.
  */
object Ingest {

  // ---------------------------------------------------------------------
  // codec registry
  // ---------------------------------------------------------------------

  /** Codec sniff by magic bytes — the dispatch a mixed-provenance corpus
    * needs (provenance metadata lies; the first bytes don't).
    */
  def sniffCodec(bytes: Array[Byte]): Option[String] = {
    def b(i: Int) = if (bytes != null && i < bytes.length) bytes(i) & 0xff else -1
    if (b(0) == 0x1f && b(1) == 0x8b) Some("gzip")
    else if (b(0) == 0x28 && b(1) == 0xb5 && b(2) == 0x2f && b(3) == 0xfd) Some("zstd")
    else if (b(0) == 'B' && b(1) == 'Z' && b(2) == 'h') Some("bzip2")
    else if (b(0) == 0xfd && b(1) == '7' && b(2) == 'z' && b(3) == 'X' && b(4) == 'Z') Some("xz")
    else if (b(0) == 0x04 && b(1) == 0x22 && b(2) == 0x4d && b(3) == 0x18) Some("lz4")
    else None
  }

  /** Compress (fixture/sink side). Codec names match [[sniffCodec]]. */
  def compress(bytes: Array[Byte], codec: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out: java.io.OutputStream = codec match {
      case "gzip"  => new java.util.zip.GZIPOutputStream(bos)
      case "zstd"  => new com.github.luben.zstd.ZstdOutputStream(bos, 3)
      // small block / preset: compress() runs per-ROW in fixture and sink
      // paths, and bzip2 block 9 (~7.6 MB) / xz preset 6 (~94 MB encoder)
      // would allocate that per record; level is a ratio knob, not a
      // compatibility one — decoders accept any.
      case "bzip2" => new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos, 1)
      case "xz"    => new org.apache.commons.compress.compressors.xz.XZCompressorOutputStream(bos, 0)
      case "lz4"   => new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorOutputStream(bos)
      case other   => throw new IllegalArgumentException(s"unknown codec: $other")
    }
    out.write(bytes); out.close()
    bos.toByteArray
  }

  /** Decompress with codec auto-detection; None for unrecognized or
    * corrupt input (the error channel — a 100 TB crawl always contains
    * truncated members, and one of them must not kill the stage).
    */
  def decompress(bytes: Array[Byte]): Option[(String, Array[Byte])] =
    sniffCodec(bytes).flatMap { codec =>
      try {
        val bis = new java.io.ByteArrayInputStream(bytes)
        val in: java.io.InputStream = codec match {
          case "gzip"  => new java.util.zip.GZIPInputStream(bis)
          case "zstd"  => new com.github.luben.zstd.ZstdInputStream(bis)
          case "bzip2" => new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(bis)
          case "xz"    => new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(bis)
          case "lz4"   => new org.apache.commons.compress.compressors.lz4.FramedLZ4CompressorInputStream(bis)
        }
        try {
          val bos = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          Some(codec -> bos.toByteArray)
        } finally in.close()
      } catch { case _: java.io.IOException | _: RuntimeException => None }
    }

  // ---------------------------------------------------------------------
  // RFC 1952 gzip member walk
  // ---------------------------------------------------------------------

  private final val FTEXT = 1; private final val FHCRC = 2
  private final val FEXTRA = 4; private final val FNAME = 8; private final val FCOMMENT = 16

  /** Split a concatenation of gzip members into per-member DECODED payloads,
    * verifying each member's CRC32 and ISIZE trailer. This is the WARC
    * framing primitive: record-at-time compression means one gzip member ==
    * one WARC record, and `GZIPInputStream`'s transparent concatenation
    * erases exactly that boundary.
    *
    * Throws IllegalArgumentException on malformed framing — callers that
    * want a soft error channel wrap it (see [[warcIngest]]).
    */
  def gzipMembers(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var off = 0
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int) = (u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    while (off < bytes.length) {
      require(off + 10 <= bytes.length && u8(off) == 0x1f && u8(off + 1) == 0x8b,
        s"gzip member: bad magic at offset $off")
      require(u8(off + 2) == 8, s"gzip member: CM=${u8(off + 2)} is not deflate")
      val flg = u8(off + 3)
      var p = off + 10
      // A member truncated inside its optional headers must surface as the
      // documented IllegalArgumentException, not a raw AIOOBE.
      def need(n: Int): Unit = require(p.toLong + n <= bytes.length,
        s"gzip member at $off: truncated header")
      if ((flg & FEXTRA) != 0) { need(2); p += 2 + u16(p); need(0) }
      if ((flg & FNAME) != 0) { while (p < bytes.length && u8(p) != 0) p += 1; need(1); p += 1 }
      if ((flg & FCOMMENT) != 0) { while (p < bytes.length && u8(p) != 0) p += 1; need(1); p += 1 }
      if ((flg & FHCRC) != 0) { need(2); p += 2 }
      need(0)
      val inf = new java.util.zip.Inflater(true) // raw deflate, no zlib wrapper
      try {
        inf.setInput(bytes, p, bytes.length - p)
        val bos = new java.io.ByteArrayOutputStream(8192)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput())
            throw new IllegalArgumentException(s"gzip member at $off: truncated deflate stream")
          bos.write(buf, 0, n)
        }
        val payload = bos.toByteArray
        val trailer = p + inf.getBytesRead.toInt
        require(trailer + 8 <= bytes.length, s"gzip member at $off: missing trailer")
        val crc = new java.util.zip.CRC32(); crc.update(payload)
        require(u32(trailer) == crc.getValue,
          s"gzip member at $off: CRC32 mismatch")
        require(u32(trailer + 4) == (payload.length.toLong & 0xffffffffL),
          s"gzip member at $off: ISIZE mismatch")
        out += payload
        off = trailer + 8
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"gzip member at $off: ${e.getMessage}")
      } finally inf.end()
    }
    out.result()
  }

  /** One gzip member per record — the fixture/sink-side inverse of
    * [[gzipMembers]], producing the record-at-time layout CC mandates.
    */
  def gzipConcat(records: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(r); g.finish(); g.close()
    }
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // WARC (ISO 28500)
  // ---------------------------------------------------------------------

  final case class WarcRecord(
      warcType: String,
      targetUri: Option[String],
      recordId: Option[String],
      contentType: Option[String],
      payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Serialize a WARC record (fixture/sink side): version line, named
    * headers, exact Content-Length, blank line, payload, record trailer.
    */
  def writeWarcRecord(rec: WarcRecord): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "WARC/1.0" ++= Crlf
    sb ++= s"WARC-Type: ${rec.warcType}" ++= Crlf
    rec.recordId.foreach(id => sb ++= s"WARC-Record-ID: $id" ++= Crlf)
    rec.targetUri.foreach(u => sb ++= s"WARC-Target-URI: $u" ++= Crlf)
    rec.contentType.foreach(ct => sb ++= s"Content-Type: $ct" ++= Crlf)
    sb ++= s"Content-Length: ${rec.payload.length}" ++= Crlf ++= Crlf
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + rec.payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(rec.payload, 0, out, head.length, rec.payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Parse one decoded gzip member as a WARC record. Header names are
    * case-insensitive (ISO 28500 §4); payload length comes from
    * Content-Length EXACTLY — WARC payloads are binary and may contain
    * anything, so scanning for separators instead of honoring the declared
    * length is the classic corruption bug this parser refuses to have.
    */
  def parseWarcRecord(bytes: Array[Byte]): Option[WarcRecord] = {
    val sepIdx = indexOfCrlfCrlf(bytes, 0)
    if (sepIdx < 0) return None
    val head = new String(bytes, 0, sepIdx, java.nio.charset.StandardCharsets.UTF_8)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val headers = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val len = headers.get("content-length").flatMap(s => s.toIntOption)
    len.flatMap { n =>
      val start = sepIdx + 4
      if (start + n > bytes.length) None
      else Some(WarcRecord(
        headers.getOrElse("warc-type", ""),
        headers.get("warc-target-uri"),
        headers.get("warc-record-id"),
        headers.get("content-type"),
        java.util.Arrays.copyOfRange(bytes, start, start + n)))
    }
  }

  /** Parse the HTTP response envelope from a `response` record's payload:
    * (status, Content-Type header value if present, bodyBytes). The body
    * starts after the first CRLFCRLF; headers decode as ISO-8859-1 (the
    * HTTP/1.1 field encoding — identity on bytes, never throws).
    */
  def parseHttpResponse(payload: Array[Byte]): Option[(Int, Option[String], Array[Byte])] =
    parseHttpHeaders(payload).map { case (status, headers, body) =>
      (status, headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("content-type") => v
      }, body)
    }

  /** Full header parse of an HTTP response payload: (status, ALL header
    * fields in wire order with repeats preserved, bodyBytes). The
    * repeat-preserving form matters for list-valued fields (an
    * `X-Robots-Tag` may legally appear once per directive source).
    */
  def parseHttpHeaders(
      payload: Array[Byte]): Option[(Int, Vector[(String, String)], Array[Byte])] = {
    val sep = indexOfCrlfCrlf(payload, 0)
    if (sep < 0) return None
    val head = new String(payload, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    // unfold obs-fold continuations (RFC 7230 §3.2.4: a line starting with
    // SP/HTAB extends the previous header) BEFORE field splitting — a folded
    // Content-Type must not lose its charset parameter
    val lines = head.split("\r\n").foldLeft(Vector.empty[String]) { (acc, l) =>
      if (acc.nonEmpty && l.nonEmpty && (l.head == ' ' || l.head == '\t'))
        acc.init :+ (acc.last + " " + l.trim)
      else acc :+ l
    }
    if (!lines(0).startsWith("HTTP/")) return None
    val parts = lines(0).split(" ")
    if (parts.length < 2) return None
    parts(1).toIntOption.map { status =>
      val headers = lines.drop(1).flatMap(_.split(":", 2) match {
        case Array(k, v) => Some(k.trim -> v.trim)
        case _           => None
      })
      (status, headers, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
    }
  }

  /** Strip the HTTP response envelope: returns (status, bodyBytes). */
  def stripHttpEnvelope(payload: Array[Byte]): Option[(Int, Array[Byte])] =
    parseHttpResponse(payload).map { case (status, _, body) => (status, body) }

  // ---------------------------------------------------------------------
  // HTTP body charset (WHATWG encoding sniff, deterministic layers)
  // ---------------------------------------------------------------------

  private val charsetParamRe =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9._:\\-]+)")

  /** WHATWG Encoding label table, reduced to the rows that differ from JDK
    * `Charset.forName`: every latin1/ascii-family label is an alias of
    * windows-1252 (browsers NEVER decode as true ISO-8859-1 — bytes
    * 0x80-0x9F are €/smart-quotes on the real web, not C1 controls).
    * Everything else passes through to the JDK lookup unchanged.
    */
  private val Cp1252Labels: Set[String] = Set(
    "ansi_x3.4-1968", "ascii", "cp819", "cp1252", "csisolatin1", "ibm819",
    "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591", "iso_8859-1",
    "iso_8859-1:1987", "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252")

  private def normalizeLabel(label: String, fromMeta: Boolean): String = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (Cp1252Labels(l)) "windows-1252"
    // the HTML spec's meta rules: a UTF-16 label in a byte-level prescan is
    // self-contradictory (the document decoded as ASCII-compatible bytes),
    // so it means UTF-8; x-user-defined means windows-1252
    else if (fromMeta && (l == "utf-16" || l == "utf-16le" || l == "utf-16be")) "utf-8"
    else if (fromMeta && l == "x-user-defined") "windows-1252"
    else l
  }

  /** One `<meta …>` tag's attributes as (lowercased name → value), parsed
    * with the WHATWG prescan's attribute rules (quoted or bare values,
    * first occurrence of a name wins), plus the index in `s` just past the
    * consumed tag's closing '>' (or `s.length` when unterminated) — the
    * prescan resumes THERE, so a `<meta` literal inside a quoted attribute
    * value is never re-parsed as a real tag. `s` starts just past "<meta".
    */
  private def metaAttrs(s: String): (Map[String, String], Int) = {
    val out = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    val n = s.length
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
    def done = (out.toMap, if (i < n) i + 1 else n)
    while (i < n && s(i) != '>') {
      while (i < n && (ws(s(i)) || s(i) == '/')) i += 1
      if (i >= n || s(i) == '>') return done
      val n0 = i
      while (i < n && !ws(s(i)) && s(i) != '=' && s(i) != '>' && s(i) != '/') i += 1
      val name = s.substring(n0, i).toLowerCase(java.util.Locale.ROOT)
      while (i < n && ws(s(i))) i += 1
      var value = ""
      if (i < n && s(i) == '=') {
        i += 1
        while (i < n && ws(s(i))) i += 1
        if (i < n && (s(i) == '"' || s(i) == '\'')) {
          val q = s(i); i += 1
          val v0 = i
          while (i < n && s(i) != q) i += 1
          value = s.substring(v0, math.min(i, n))
          if (i < n) i += 1
        } else {
          val v0 = i
          while (i < n && !ws(s(i)) && s(i) != '>') i += 1
          value = s.substring(v0, i)
        }
      }
      if (name.nonEmpty && !out.contains(name)) out(name) = value
    }
    done
  }

  /** The WHATWG meta prescan's charset declarations over an (uncommented)
    * window, IN ORDER: only a real `charset` ATTRIBUTE, or a `charset=`
    * parameter inside the `content` of a `http-equiv=content-type` meta,
    * declares an encoding — `charset=` text in an unrelated attribute
    * value (e.g. a description) must not. Returns every declared label:
    * per the spec, a label that fails to resolve does NOT end the prescan
    * (`<meta charset=bogus><meta charset=gbk>` decodes GBK in a browser),
    * so the caller tries each in order.
    */
  private def metaPrescanCharsets(uncommented: String): List[String] = {
    val lower = uncommented.toLowerCase(java.util.Locale.ROOT)
    val out = List.newBuilder[String]
    var from = 0
    var at = lower.indexOf("<meta", from)
    while (at >= 0) {
      val tail = at + 5
      // "<meta" must end the tag name: whitespace or / closes it
      if (tail < uncommented.length &&
          (uncommented(tail) == ' ' || uncommented(tail) == '\t' ||
           uncommented(tail) == '\n' || uncommented(tail) == '\r' ||
           uncommented(tail) == '\f' || uncommented(tail) == '/')) {
        val (attrs, consumed) = metaAttrs(uncommented.substring(tail))
        attrs.get("charset").filter(_.nonEmpty) match {
          case Some(label) => out += label
          case None =>
            if (attrs.get("http-equiv").exists(_.equalsIgnoreCase("content-type")))
              attrs.get("content").foreach { c =>
                val m = charsetParamRe.matcher(c)
                if (m.find()) out += m.group(1)
              }
        }
        // resume past the consumed tag's closing '>' (WHATWG: the prescan
        // advances past the whole tag), not at the tag-name end — a <meta
        // literal inside a quoted attribute value must not re-parse as a
        // real tag and declare a bogus charset
        from = tail + consumed
      } else from = tail
      at = lower.indexOf("<meta", from)
    }
    out.result()
  }

  /** The charset an HTTP body decodes under — the WHATWG sniff reduced to
    * its deterministic layers, in precedence order:
    *  1. a UTF BOM (overrides any declaration — WHATWG Encoding §6);
    *  2. the `charset=` parameter of the Content-Type header;
    *  3. a `<meta charset=…>` / `<meta http-equiv … content="…charset=…">`
    *     prescan over the first 1024 bytes (read as ISO-8859-1 — identity
    *     on bytes, so the scan itself can't mojibake);
    *  4. UTF-8.
    * Labels resolve through the WHATWG table first ([[normalizeLabel]]:
    * latin1/ascii family → windows-1252, meta-declared UTF-16 → UTF-8),
    * then the JDK. Unknown or JDK-unsupported labels fall through to the
    * next layer — real crawls carry garbage labels and must degrade,
    * never throw.
    */
  def resolveCharset(contentType: Option[String],
                     body: Array[Byte]): java.nio.charset.Charset = {
    def b(i: Int) = if (body != null && i < body.length) body(i) & 0xff else -1
    if (b(0) == 0xef && b(1) == 0xbb && b(2) == 0xbf)
      return java.nio.charset.StandardCharsets.UTF_8
    if (b(0) == 0xfe && b(1) == 0xff) return java.nio.charset.StandardCharsets.UTF_16BE
    if (b(0) == 0xff && b(1) == 0xfe) return java.nio.charset.StandardCharsets.UTF_16LE
    def lookup(label: String, fromMeta: Boolean): Option[java.nio.charset.Charset] =
      try Some(java.nio.charset.Charset.forName(normalizeLabel(label, fromMeta)))
      catch { case _: Exception => None }
    val fromHeader = contentType.flatMap { ct =>
      val m = charsetParamRe.matcher(ct)
      if (m.find()) lookup(m.group(1), fromMeta = false) else None
    }
    fromHeader.getOrElse {
      val win = new String(body, 0, math.min(1024, body.length),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      // the WHATWG prescan SKIPS comments — a commented-out
      // <meta charset=…> must not select the encoding
      val uncommented = win.replaceAll("(?s)<!--.*?(-->|$)", " ")
      metaPrescanCharsets(uncommented).iterator
        .flatMap(lookup(_, fromMeta = true)).nextOption()
        .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    }
  }

  /** Decode an HTTP body via [[resolveCharset]], stripping the BOM when one
    * selected the charset (browsers never surface U+FEFF as content).
    * Malformed sequences decode as U+FFFD (the `new String` default) —
    * degradation, not an exception. Returns (text, canonical charset name).
    */
  def decodeHttpBody(body: Array[Byte],
                     contentType: Option[String]): (String, String) = {
    val cs = resolveCharset(contentType, body)
    def b(i: Int) = if (i < body.length) body(i) & 0xff else -1
    val skip =
      if (cs == java.nio.charset.StandardCharsets.UTF_8 &&
        b(0) == 0xef && b(1) == 0xbb && b(2) == 0xbf) 3
      else if ((cs == java.nio.charset.StandardCharsets.UTF_16BE &&
        b(0) == 0xfe && b(1) == 0xff) ||
        (cs == java.nio.charset.StandardCharsets.UTF_16LE &&
          b(0) == 0xff && b(1) == 0xfe)) 2
      else 0
    (new String(body, skip, body.length - skip, cs),
      cs.name().toLowerCase(java.util.Locale.ROOT))
  }

  private def indexOfCrlfCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  // ---------------------------------------------------------------------
  // DataFrame operators
  // ---------------------------------------------------------------------

  /** (id, blob) → (id, codec, n_raw, charset, text): auto-detected
    * decompression of one compressed document per row. Unrecognized/corrupt
    * blobs surface as codec NULL with NULL text (soft error channel), never
    * an exception. Decoded bytes go through the same charset sniff as the
    * HTTP path ([[decodeHttpBody]] with no header: BOM > meta prescan >
    * UTF-8) — a BOM'd or meta-declared archived page decodes correctly
    * instead of mojibaking. Pure per-row CPU — no shuffle, scales with
    * input splits.
    */
  def decompressText(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("codec", StringType),
      StructField("n_raw", LongType),
      StructField("charset", StringType),
      StructField("text", StringType)))
    val rdd = df.select(col(idCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        decompress(r.getAs[Array[Byte]](1)) match {
          case Some((codec, raw)) =>
            val (text, cs) = decodeHttpBody(raw, None)
            Row(id, codec, raw.length.toLong, cs, text)
          case None => Row(id, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** (file, warcGz) → one row per HTTP `response` record carrying every
    * occurrence of ONE named header: (file, url, status, vals). The
    * governance-signal scan a crawl pipeline runs beside the text path —
    * `X-Robots-Tag` opt-outs, cache-control audits — without decoding
    * bodies at all (headers only; the body bytes are never charset-
    * decoded). Same shape as [[warcIngest]]: per-file mapPartitions,
    * zero shuffle, malformed files yield zero rows.
    */
  def warcHeaderScan(df: DataFrame, fileCol: String, blobCol: String,
                     header: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("file", LongType),
      StructField("url", StringType),
      StructField("status", IntegerType),
      StructField("vals", ArrayType(StringType))))
    val rdd = df.select(col(fileCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val file = r.getLong(0)
        val members =
          try gzipMembers(r.getAs[Array[Byte]](1))
          catch { case scala.util.control.NonFatal(_) => Vector.empty }
        members.iterator
          .flatMap(parseWarcRecord)
          .filter(_.warcType == "response")
          .flatMap { rec =>
            parseHttpHeaders(rec.payload).map { case (status, headers, _) =>
              val vals = headers.collect {
                case (k, v) if k.equalsIgnoreCase(header) => v
              }
              Row(file, rec.targetUri.orNull, status, vals)
            }
          }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** (file, warcGz) → one row per HTTP `response` record: (file, url,
    * status, n_bytes, charset, text). The full CC read path: gzip member
    * split → WARC header parse → type filter (warcinfo/request records
    * skipped, exactly what a text pipeline does) → HTTP envelope strip →
    * charset-aware body decode ([[decodeHttpBody]]: BOM > Content-Type
    * header > meta prescan > UTF-8 — real crawls are heavily ISO-8859-1 /
    * windows-1252 / GBK, and decoding them as UTF-8 would mojibake every
    * downstream text operator). `n_bytes` counts WIRE bytes (pre-decode);
    * `charset` is the canonical name actually used. Malformed FILES yield
    * zero rows rather than failing the stage; per-file record ORDER is
    * preserved (member order is crawl order and downstream packing
    * depends on it).
    */
  def warcIngest(df: DataFrame, fileCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("file", LongType),
      StructField("url", StringType),
      StructField("status", IntegerType),
      StructField("n_bytes", LongType),
      StructField("charset", StringType),
      StructField("text", StringType)))
    val rdd = df.select(col(fileCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val file = r.getLong(0)
        val members =
          try gzipMembers(r.getAs[Array[Byte]](1))
          catch { case scala.util.control.NonFatal(_) => Vector.empty }
        members.iterator
          .flatMap(parseWarcRecord)
          .filter(_.warcType == "response")
          .flatMap { rec =>
            parseHttpResponse(rec.payload).map { case (status, ct, body) =>
              val (text, cs) = decodeHttpBody(body, ct)
              Row(file, rec.targetUri.orNull, status, body.length.toLong, cs, text)
            }
          }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  // ------------------------------------------------------------------ ARC
  // The PRE-WARC archive format (arc.alexa file format v1) — Common
  // Crawl 2008-2012 and the Internet Archive's first two decades ship
  // as .arc.gz, so a pipeline that only reads WARC silently drops the
  // early web. One space-separated header LINE per record
  // (`URL IP-address Archive-date Content-type Archive-length`), LF,
  // `Archive-length` payload bytes, LF; the first record of every file
  // is the `filedesc://` version block. Per-record gzip members
  // concatenate exactly like WARC (the CC convention), so the member
  // splitter is shared.

  final case class ArcRecord(url: String, ip: String, date: String,
                             contentType: String, payload: Array[Byte])

  def writeArcRecord(rec: ArcRecord): Array[Byte] = {
    require(!Seq(rec.url, rec.ip, rec.date, rec.contentType)
      .exists(f => f.isEmpty || f.exists(c => c == ' ' || c == '\n')),
      "ARC header fields are space-delimited and single-line")
    val head = s"${rec.url} ${rec.ip} ${rec.date} ${rec.contentType} ${rec.payload.length}\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + rec.payload.length + 1)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(rec.payload, 0, out, head.length, rec.payload.length)
    out(out.length - 1) = '\n'
    out
  }

  /** The mandatory first record of an ARC file: a `filedesc://` URL
    * whose payload is the version line + the header-field declaration.
    */
  def writeArcVersionBlock(filename: String, date: String): Array[Byte] = {
    val body = ("1 0 graft\n" +
      "URL IP-address Archive-date Content-type Archive-length\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    writeArcRecord(ArcRecord(s"filedesc://$filename", "0.0.0.0", date,
      "text/plain", body))
  }

  /** One decoded member as an ARC record. The payload length comes
    * from the declared `Archive-length` EXACTLY (same refusal-over-
    * scanning stance as [[parseWarcRecord]] — payloads are binary).
    */
  def parseArcRecord(bytes: Array[Byte]): Option[ArcRecord] = {
    if (bytes == null || bytes.length == 0) return None
    var nl = 0
    while (nl < bytes.length && bytes(nl) != '\n') nl += 1
    if (nl == 0 || nl >= bytes.length) return None
    val head = new String(bytes, 0, nl,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val f = head.split(" ")
    if (f.length != 5) return None
    f(4).toIntOption.flatMap { n =>
      val start = nl + 1
      if (n < 0 || start + n > bytes.length) None
      else Some(ArcRecord(f(0), f(1), f(2), f(3),
        java.util.Arrays.copyOfRange(bytes, start, start + n)))
    }
  }

  /** Ingest a DataFrame of (file id, .arc.gz bytes): gzip-member split
    * → version-block validation (a file whose FIRST member is not a
    * `filedesc://` v1/v2 block is not an ARC file — all its records
    * are dropped, surfacing as missing rows, never as mojibake) → per-
    * record HTTP envelope strip → charset-aware decode, sharing every
    * stage below the header parse with the WARC path. Shuffle-free.
    */
  def arcIngest(df: DataFrame, fileCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("file", LongType),
      StructField("url", StringType),
      StructField("ip", StringType),
      StructField("arc_date", StringType),
      StructField("status", IntegerType),
      StructField("n_bytes", LongType),
      StructField("charset", StringType),
      StructField("text", StringType)))
    val rdd = df.select(col(fileCol).cast("long"), col(blobCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val file = r.getLong(0)
        val members =
          try gzipMembers(r.getAs[Array[Byte]](1))
          catch { case scala.util.control.NonFatal(_) => Vector.empty }
        val versionOk = members.headOption.flatMap(parseArcRecord).exists { v =>
          v.url.startsWith("filedesc://") && {
            val p = new String(v.payload,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            p.startsWith("1 ") || p.startsWith("2 ")
          }
        }
        if (!versionOk) Iterator.empty
        else members.iterator.drop(1)
          .flatMap(parseArcRecord)
          .filter(!_.url.startsWith("filedesc://"))
          .flatMap { rec =>
            parseHttpResponse(rec.payload).map { case (status, ct, body) =>
              val (text, cs) = decodeHttpBody(body, ct)
              Row(file, rec.url, rec.ip, rec.date, status,
                body.length.toLong, cs, text)
            }
          }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
