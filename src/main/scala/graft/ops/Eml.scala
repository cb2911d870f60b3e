package graft.ops

/** EML / MIME email extraction — mail archives (Enron-class corpora,
  * mbox exports, `.eml` crawl attachments) are a standing LLM training
  * source, and their text arrives behind THREE encoding layers a naive
  * reader mangles: RFC 5322 header folding, RFC 2047 encoded-word
  * subjects, and RFC 2045 content-transfer-encodings (quoted-printable,
  * base64) under per-part MIME charsets. Reference scope: the reference
  * ships no mail reader (`/root/reference/src` delegates scans to
  * DuckDB); this op extends the training-pipeline surface like
  * [[Docx]]/[[Rtf]]. From-scratch decoder + deterministic fixture with
  * closed-form logical text (exact-oracle-able) + independent Python
  * mirror (`tools/check_eml_fixture.py`).
  *
  * Extraction semantics (deterministic, oracle-able):
  *  - headers unfold (CRLF + WSP joins to ONE space per RFC 5322 §2.2.3
  *    folding semantics), names case-insensitive;
  *  - `Subject:` decodes RFC 2047 encoded-words (`=?cs?Q?..?=` with
  *    `_`→space and `=hh`, `=?cs?B?..?=` base64) for utf-8 /
  *    iso-8859-1 / windows-1252 / us-ascii charsets — anything else
  *    REFUSES (a skipped subject would silently drop signal);
  *  - `multipart` bodies of any subtype split on the `--boundary` lines (preamble
  *    and epilogue discarded, `--boundary--` closes) and recurse —
  *    nesting (e.g. alternative inside mixed) is structural, not a
  *    special case;
  *  - every `text/plain` LEAF part decodes through its
  *    Content-Transfer-Encoding (7bit/8bit identity, quoted-printable
  *    with soft `=CRLF` breaks, base64 ignoring whitespace) then its
  *    declared charset, CRLF canonicalized to `\n`, and joins the
  *    document text in order; `text/html` and any other leaf kind
  *    contribute NOTHING (the html twin of the same content would
  *    double every message — the classic mbox-ingest bug);
  *  - a message with no Content-Type is a `text/plain; charset=us-ascii`
  *    single part (the RFC 2045 default).
  *
  * Malformed input is DATA, not a crash, and refusal beats mojibake:
  * a multipart without its closing `--boundary--`, a bad base64 or
  * quoted-printable byte, an unknown transfer encoding, an undecodable
  * charset label, or an encoded-word that does not round-trip → None.
  *
  * Scale note: per-blob CPU work inside `mapPartitions` — shuffle-free,
  * scales with executor count like the PDF/DOCX/RTF paths.
  */
object Eml {

  /** Decoded-output cap per message — a crafted base64 bomb refuses
    * instead of filling an executor's heap.
    */
  private val MaxTextChars = 64 * 1024 * 1024

  final case class Email(subject: String, fromAddr: String,
                         parts: Vector[String])

  private final class EmlRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new EmlRefused(msg)

  /** Subject, From, and the text/plain parts in order. None on any
    * violation.
    */
  def extractEmail(bytes: Array[Byte]): Option[Email] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val (headers, body) = splitMessage(raw)
      if (headers.isEmpty) bad("no headers")
      val subject = decodeEncodedWords(header(headers, "subject").getOrElse(""))
      val from = header(headers, "from").getOrElse("")
      val parts = Vector.newBuilder[String]
      collectParts(headers, body, parts, depth = 0)
      Some(Email(subject, from, parts.result()))
    } catch { case _: EmlRefused => None }
  }

  // -- RFC 5322 header section -------------------------------------------------

  /** Split into (unfolded headers, body). The header/body separator is
    * the first empty line; bare-LF messages (common in mbox exports)
    * are tolerated alongside CRLF.
    */
  private def splitMessage(raw: String): (Vector[(String, String)], String) = {
    val sepCrlf = raw.indexOf("\r\n\r\n")
    val sepLf = raw.indexOf("\n\n")
    val (headRaw, body) =
      if (sepCrlf >= 0 && (sepLf < 0 || sepCrlf + 1 <= sepLf))
        (raw.substring(0, sepCrlf), raw.substring(sepCrlf + 4))
      else if (sepLf >= 0) (raw.substring(0, sepLf), raw.substring(sepLf + 2))
      else (raw, "")
    (unfold(headRaw), body)
  }

  private def unfold(headRaw: String): Vector[(String, String)] = {
    val lines = headRaw.split("\r\n|\n", -1)
    val joined = Vector.newBuilder[String]
    var cur: String = null
    for (ln <- lines) {
      if (ln.nonEmpty && (ln.charAt(0) == ' ' || ln.charAt(0) == '\t')) {
        if (cur == null) bad("continuation before first header")
        // folding CRLF+WSP is semantically one space
        cur = cur + " " + ln.trim
      } else {
        if (cur != null) joined += cur
        cur = ln
      }
    }
    if (cur != null && cur.nonEmpty) joined += cur
    joined.result().map { h =>
      val i = h.indexOf(':')
      if (i <= 0) bad(s"header without colon: ${h.take(40)}")
      (h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT),
        h.substring(i + 1).trim)
    }
  }

  private def header(hs: Vector[(String, String)], name: String): Option[String] =
    hs.find(_._1 == name).map(_._2)

  // -- RFC 2047 encoded-words --------------------------------------------------

  private val EncWord =
    java.util.regex.Pattern.compile("=\\?([^?]+)\\?([QqBb])\\?([^?]*)\\?=")

  private[graft] def decodeEncodedWords(s: String): String = {
    val m = EncWord.matcher(s)
    val out = new StringBuilder
    var last = 0
    var sawWord = false
    while (m.find()) {
      val between = s.substring(last, m.start())
      // whitespace BETWEEN two encoded words is transparent (RFC 2047 §6.2)
      if (!(sawWord && between.nonEmpty && between.forall(c => c == ' ' || c == '\t')))
        out.append(between)
      val cs = charsetFor(m.group(1))
      val enc = m.group(2).toUpperCase(java.util.Locale.ROOT)
      val payload = m.group(3)
      val bytes =
        if (enc == "B") base64(payload)
        else qDecode(payload)
      out.append(decodeCharset(bytes, cs))
      sawWord = true
      last = m.end()
    }
    out.append(s.substring(last))
    out.toString
  }

  /** Q-encoding (RFC 2047 §4.2): `_` is SPACE, `=hh` a byte. */
  private def qDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '_' => out.write(' '); i += 1
        case '=' =>
          if (i + 2 >= s.length) bad("truncated Q escape")
          out.write(hex(s, i + 1)); i += 3
        case c =>
          if (c > 0x7e) bad(s"raw 8-bit char in Q word")
          out.write(c.toInt); i += 1
      }
    }
    out.toByteArray
  }

  // -- MIME structure ----------------------------------------------------------

  /** `Content-Type` → (type/subtype lowercase, params lowercase-keyed). */
  private[ops] def parseContentType(v: String): (String, Map[String, String]) = {
    val segs = v.split(";").toVector
    val mime = segs.head.trim.toLowerCase(java.util.Locale.ROOT)
    val params = segs.tail.flatMap { p =>
      val i = p.indexOf('=')
      if (i <= 0) None
      else {
        val k = p.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
        var vv = p.substring(i + 1).trim
        if (vv.length >= 2 && vv.startsWith("\"") && vv.endsWith("\""))
          vv = vv.substring(1, vv.length - 1)
        Some(k -> vv)
      }
    }.toMap
    (mime, params)
  }

  private def collectParts(headers: Vector[(String, String)], body: String,
                           out: scala.collection.mutable.Builder[String, Vector[String]],
                           depth: Int): Unit = {
    if (depth > 8) bad("multipart nesting bomb")
    val (mime, params) = parseContentType(
      header(headers, "content-type").getOrElse("text/plain; charset=us-ascii"))
    if (mime.startsWith("multipart/")) {
      val boundary = params.getOrElse("boundary", bad("multipart without boundary"))
      for (part <- splitMultipart(body, boundary)) {
        val (ph, pb) = splitMessage(part)
        collectParts(ph, pb, out, depth + 1)
      }
    } else if (mime == "text/plain") {
      val cte = header(headers, "content-transfer-encoding")
        .getOrElse("7bit").trim.toLowerCase(java.util.Locale.ROOT)
      val bytes = cte match {
        case "7bit" | "8bit" | "binary" =>
          body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        case "quoted-printable" => qpDecode(body)
        case "base64" => base64(body)
        case other => bad(s"unknown transfer encoding $other")
      }
      val cs = charsetFor(params.getOrElse("charset", "us-ascii"))
      val text = decodeCharset(bytes, cs).replace("\r\n", "\n")
      if (text.length > MaxTextChars) bad("text cap")
      // transfer padding: a trailing newline from the part framing
      out += (if (text.endsWith("\n")) text.dropRight(1) else text)
    }
    // any other leaf type (text/html, application/*, image/*) is non-text
  }

  /** Parts between `--boundary` delimiters; the closing `--boundary--`
    * is REQUIRED (a truncated multipart otherwise silently drops its
    * tail part).
    */
  private[ops] def splitMultipart(body: String, boundary: String): Vector[String] = {
    val lines = body.split("\r\n|\n", -1)
    val parts = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inPart = false
    var closed = false
    val delim = "--" + boundary
    for (ln <- lines if !closed) {
      if (ln == delim) {
        if (inPart) parts += chompLast(cur.toString)
        cur.setLength(0); inPart = true
      } else if (ln == delim + "--") {
        if (!inPart) bad("multipart close before first part")
        parts += chompLast(cur.toString)
        closed = true
      } else if (inPart) {
        cur.append(ln).append('\n')
      } // else: preamble, discarded
    }
    if (!closed) bad("multipart without closing boundary")
    parts.result()
  }

  /** The newline BEFORE a boundary delimiter belongs to the delimiter,
    * not the part (RFC 2046 §5.1.1).
    */
  private def chompLast(s: String): String =
    if (s.endsWith("\n")) s.dropRight(1) else s

  // -- RFC 2045 transfer encodings ---------------------------------------------

  private[ops] def qpDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=') {
        if (i + 2 < s.length && s.charAt(i + 1) == '\r' && s.charAt(i + 2) == '\n') {
          i += 3 // soft break
        } else if (i + 1 < s.length && s.charAt(i + 1) == '\n') {
          i += 2 // soft break, bare-LF form
        } else if (i + 2 < s.length) {
          out.write(hex(s, i + 1)); i += 3
        } else bad("truncated QP escape")
      } else if (c <= 0xff) { out.write(c.toInt); i += 1 }
      else bad("non-byte char in QP stream")
    }
    out.toByteArray
  }

  private def hex(s: String, at: Int): Int = {
    def d(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else bad(s"bad hex digit $c")
    d(s.charAt(at)) * 16 + d(s.charAt(at + 1))
  }

  private[ops] def base64(s: String): Array[Byte] = {
    val compact = s.filterNot(c => c == '\r' || c == '\n' || c == ' ' || c == '\t')
    try java.util.Base64.getDecoder.decode(compact)
    catch { case _: IllegalArgumentException => bad("bad base64") }
  }

  // -- charsets ----------------------------------------------------------------

  /** The charsets mail actually uses; anything else refuses (decoding
    * through the wrong table is silent corpus corruption).
    */
  private def charsetFor(label: String): java.nio.charset.Charset = {
    label.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "utf-8" | "utf8" => java.nio.charset.StandardCharsets.UTF_8
      case "us-ascii" | "ascii" => java.nio.charset.StandardCharsets.US_ASCII
      case "iso-8859-1" | "latin1" => java.nio.charset.StandardCharsets.ISO_8859_1
      case "windows-1252" | "cp1252" => java.nio.charset.Charset.forName("windows-1252")
      case other => bad(s"unsupported charset $other")
    }
  }

  private def decodeCharset(bytes: Array[Byte],
                            cs: java.nio.charset.Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => bad("undecodable bytes") }
  }

  // -- mbox container ----------------------------------------------------------
  // The Enron-class mailbox framing: messages concatenated behind
  // `From <addr> <date>` separator lines, with body lines that START
  // with "From " escaped as ">From " (mboxrd: any `>*From ` gains one
  // more '>'). A reader that skips the unquoting corrupts exactly the
  // lines that look like mail headers — the classic archive bug.

  /** Split an mbox file into its raw RFC 5322 messages (From_ lines
    * dropped, mboxrd quoting REVERSED, trailing separator blanks
    * trimmed). None if the file does not open with a From_ line.
    */
  def mboxMessages(bytes: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (bytes == null || bytes.length < 5) return None
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!raw.startsWith("From ")) return None
    val out = Vector.newBuilder[Array[Byte]]
    var cur: scala.collection.mutable.ArrayBuffer[String] = null
    def flush(): Unit = if (cur != null) {
      while (cur.nonEmpty && cur.last.isEmpty) cur.remove(cur.length - 1)
      out += cur.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    for (ln <- raw.split("\r\n|\n", -1)) {
      if (ln.startsWith("From ")) {
        flush()
        cur = new scala.collection.mutable.ArrayBuffer[String]
      } else if (cur != null) {
        // mboxrd unquote: ">From ", ">>From ", ... lose one '>'
        val q = ln.indexWhere(_ != '>')
        if (q > 0 && ln.startsWith("From ", q)) cur += ln.substring(1)
        else cur += ln
      }
    }
    flush()
    Some(out.result())
  }

  /** Concatenate messages into an mbox: From_ separator lines from the
    * sender address, mboxrd quoting applied, one blank separator line
    * after each message.
    */
  def mboxWrite(messages: Seq[(String, Array[Byte])]): Array[Byte] = {
    val sb = new StringBuilder
    for ((fromAddr, eml) <- messages) {
      sb.append(s"From $fromAddr Mon Jan  1 00:00:00 2012\r\n")
      val raw = new String(eml, java.nio.charset.StandardCharsets.ISO_8859_1)
      for (ln <- raw.split("\r\n|\n", -1)) {
        val q = ln.indexWhere(_ != '>')
        val isFrom = ln.startsWith("From ") ||
          (q > 0 && ln.startsWith("From ", q))
        sb.append(if (isFrom) ">" + ln else ln).append("\r\n")
      }
      sb.append("\r\n")
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  // ---------------------------------------------------------------------------
  // Deterministic fixture
  // ---------------------------------------------------------------------------

  /** Closed-form text of plain part `j` — what the oracle recomputes. */
  def logicalPart(docId: Long, j: Int): String = {
    val base = s"Part $j " +
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$docId|$j").substring(0, 12)
    if (j == 0) base + " é€\nwrapped"
    else base + " ✓"
  }

  def partCount(docId: Long): Int = 1 + (docId % 3).toInt

  def logicalSubject(docId: Long): String = s"Msg $docId é"

  /** The mbox-quoting witness message: its BODY lines start with
    * "From " and ">From ", so the container round trip must quote and
    * unquote them exactly (a drop or double-quote shifts the digest).
    */
  def guardMessage(key: Long): Array[Byte] =
    (s"From: guard@example.org\r\nSubject: Guard $key\r\n\r\n" +
      "From here\r\n>From quoted")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  def logicalGuardBody: String = "From here\n>From quoted"

  def logicalFrom(docId: Long): String = s"sender${docId % 7}@example.com"

  /** A deterministic .eml: folded headers, an encoded-word subject,
    * multipart/mixed wrapping a multipart/alternative (plain part 0 in
    * quoted-printable windows-1252 WITH a soft line break + its html
    * twin, which must contribute nothing) and base64 utf-8 plain parts
    * 1..n-1, plus an application/octet-stream attachment (ignored) and
    * a preamble and epilogue (discarded).
    */
  def syntheticEml(docId: Long): Array[Byte] = {
    val outer = s"=_outer$docId"
    val inner = s"=_inner$docId"
    val h0 = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"$docId|0").substring(0, 12)
    val sb = new StringBuilder
    sb.append(s"From: sender${docId % 7}@example.com\r\n")
    sb.append(s"To: corpus@example.org\r\n")
    // folded header: the continuation line must unfold to one space
    sb.append(s"Subject: =?utf-8?Q?Msg_${docId}_=C3=A9?=\r\n")
    sb.append("Date: Mon, 1 Jan 2024\r\n 00:00:00 +0000\r\n")
    sb.append("MIME-Version: 1.0\r\n")
    sb.append(s"""Content-Type: multipart/mixed; boundary="$outer"\r\n""")
    sb.append("\r\n")
    sb.append("Preamble for non-MIME readers - must not leak.\r\n")
    sb.append(s"--$outer\r\n")
    sb.append(s"""Content-Type: multipart/alternative; boundary="$inner"\r\n""")
    sb.append("\r\n")
    sb.append(s"--$inner\r\n")
    sb.append("Content-Type: text/plain; charset=\"windows-1252\"\r\n")
    sb.append("Content-Transfer-Encoding: quoted-printable\r\n")
    sb.append("\r\n")
    // "Part 0 <h0> é€\nwrapped" — é€ as cp1252 QP bytes, soft break
    // inside "wrapped" (decoder must join), hard CRLF before it
    sb.append(s"Part 0 $h0 =E9=80\r\nwrap=\r\nped\r\n")
    sb.append(s"--$inner\r\n")
    sb.append("Content-Type: text/html; charset=\"utf-8\"\r\n")
    sb.append("\r\n")
    sb.append(s"<html><body><p>Part 0 $h0 html twin must not leak</p></body></html>\r\n")
    sb.append(s"--$inner--\r\n")
    var j = 1
    val np = partCount(docId)
    while (j < np) {
      val txt = logicalPart(docId, j)
      val b64 = java.util.Base64.getMimeEncoder(60, "\r\n".getBytes)
        .encodeToString(txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      sb.append(s"--$outer\r\n")
      sb.append("Content-Type: text/plain; charset=utf-8\r\n")
      sb.append("Content-Transfer-Encoding: base64\r\n")
      sb.append("\r\n")
      sb.append(b64).append("\r\n")
      j += 1
    }
    sb.append(s"--$outer\r\n")
    sb.append("Content-Type: application/octet-stream\r\n")
    sb.append("Content-Transfer-Encoding: base64\r\n")
    sb.append("\r\n")
    sb.append("AAECAwQ=\r\n")
    sb.append(s"--$outer--\r\n")
    sb.append("Epilogue - also not content.\r\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
