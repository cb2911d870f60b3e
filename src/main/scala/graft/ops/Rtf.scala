package graft.ops

/** RTF text extraction — the dominant LEGACY rich-text modality in
  * crawl corpora and mail archives (WordPad/early-Word exports, TNEF
  * winmail bodies). Reference scope: the reference ships no document
  * extractors at all (it delegates scans to DuckDB —
  * `/root/reference/src` has no RTF/Office reader); this op extends the
  * training-pipeline surface the same way ops/Docx and ops/Pdf do.
  * Same design as [[Docx]]/[[Pdf]]: a strict from-scratch decoder over
  * the published format (Word RTF 1.9.1 spec grammar: groups, control
  * words, control symbols, text runs) plus a deterministic fixture
  * generator whose logical text has a closed form both engines can
  * compute (exact-oracle-able), with an independent Python mirror
  * (`tools/check_rtf_fixture.py`) re-parsing the emitted bytes with
  * zero shared code.
  *
  * Extraction semantics (deterministic, oracle-able):
  *  - plain text appends; raw CR/LF bytes in the file are ignored (they
  *    are formatting of the RTF source, not content — the classic
  *    naive-reader bug doubles every line);
  *  - `\par` ends a paragraph; `\line` is an in-paragraph newline,
  *    `\tab` a TAB; escaped `\\` `\{` `\}` are literal; `\~` is NBSP
  *    (U+00A0); `\-` (optional hyphen) contributes nothing;
  *  - `\uN` appends code point N (negative N means N+65536, the signed
  *    16-bit convention), then SKIPS the current group's `\uc` count of
  *    fallback chars (a `\'hh` counts as ONE fallback char). `\uc`
  *    scopes with the GROUP STACK — a `{\uc2\u8721 xy}` group must skip
  *    "xy" but not leak uc=2 past its closing brace;
  *  - `\'hh` decodes one byte through windows-1252 (so `\'80` is the
  *    euro sign, not U+0080 — the C1 range is remapped exactly like the
  *    WHATWG crawl-decode path in ops/Ingest);
  *  - destination groups contribute NOTHING: any starred group
  *    (`{\*\...}`) and the known non-content destinations (fonttbl,
  *    colortbl, stylesheet, info, pict, object, header/footer
  *    variants, footnote, annotation) — a naive walker would emit font
  *    names, color tables and megabytes of picture hex as "text";
  *  - `\binN` skips N RAW bytes (inside pict payloads; hex-escape and
  *    brace scanning must not run over them).
  *
  * Malformed input is DATA, not a crash, and refusal beats mojibake:
  * not-`{\rtf`, unbalanced groups, a truncated `\'h`, a `\bin` running
  * past EOF, a byte undefined in windows-1252, or a declared
  * `\ansicpg` codepage other than 1252 (whose byte semantics are the
  * only ones implemented) → None.
  *
  * Scale note: per-blob CPU work inside `mapPartitions` — shuffle-free,
  * scales with executor count like the PDF/DOCX/image paths.
  */
object Rtf {

  /** Output cap — a pathological expansion refuses instead of filling
    * an executor's heap.
    */
  private val MaxTextChars = 64 * 1024 * 1024

  /** Destinations whose content is never document text. Starred groups
    * (`{\*\...}`) are skipped wholesale regardless of this list.
    */
  private val SkipDests: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "footnote", "annotation",
    "generator", "themedata", "colorschememapping", "datastore",
    "latentstyles", "listtable", "listoverridetable", "revtbl")

  private final class RtfRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new RtfRefused(msg)

  private final class GroupState(var uc: Int, var skip: Boolean)

  /** Paragraphs of the document, in order. None on any violation. */
  def extractText(bytes: Array[Byte]): Option[Vector[String]] = {
    if (bytes == null || bytes.length < 6) return None
    if (bytes(0) != '{' || bytes(1) != '\\' || bytes(2) != 'r' ||
      bytes(3) != 't' || bytes(4) != 'f') return None
    try Some(parse(bytes))
    catch { case _: RtfRefused => None }
  }

  private def parse(bytes: Array[Byte]): Vector[String] = {
    val n = bytes.length
    val paras = Vector.newBuilder[String]
    val sb = new StringBuilder
    var stack = List.empty[GroupState]
    var cur = new GroupState(uc = 1, skip = false)
    var depth = 0
    // chars still to swallow as \u fallback (plain text or \'hh, one each)
    var pendingSkip = 0
    var p = 0
    var done = false

    def append(c: Char): Unit = {
      if (pendingSkip > 0) { pendingSkip -= 1; return }
      if (cur.skip) return
      if (sb.length >= MaxTextChars) bad("text cap")
      sb.append(c)
    }

    def controlWord(): Unit = {
      // letters, optional signed number, optional single-space
      // delimiter (the space belongs to the control word)
      var q = p + 1
      val w = new StringBuilder
      while (q < n && isLetter(bytes(q))) { w.append((bytes(q) & 0xff).toChar); q += 1 }
      var neg = false
      var num = 0L
      var hasNum = false
      if (q < n && bytes(q) == '-' && q + 1 < n && isDigit(bytes(q + 1))) {
        neg = true; q += 1
      }
      while (q < n && isDigit(bytes(q))) {
        hasNum = true
        num = num * 10 + (bytes(q) - '0')
        if (num > Int.MaxValue) bad("control-word number overflow")
        q += 1
      }
      if (q < n && bytes(q) == ' ') q += 1
      p = q
      val word = w.toString
      val arg = if (neg) -num.toInt else num.toInt
      word match {
        case "par" | "sect" | "page" =>
          pendingSkip = 0
          if (!cur.skip) { paras += sb.toString; sb.setLength(0) }
        case "line" | "lbr" => append('\n')
        case "tab" | "cell" => append('\t')
        case "emdash" => append('\u2014')
        case "endash" => append('\u2013')
        case "lquote" => append('\u2018')
        case "rquote" => append('\u2019')
        case "ldblquote" => append('\u201c')
        case "rdblquote" => append('\u201d')
        case "bullet" => append('\u2022')
        case "emspace" | "enspace" | "qmspace" => append(' ')
        case "uc" =>
          if (!hasNum || arg < 0 || arg > 16) bad(s"\\uc$arg")
          cur.uc = arg
        case "u" =>
          if (!hasNum) bad("\\u without code")
          val cp = if (arg < 0) arg + 65536 else arg
          if (cp < 0 || cp > 0xffff) bad(s"\\u$arg out of range")
          if (pendingSkip > 0) pendingSkip -= 1
          else if (!cur.skip) {
            if (sb.length >= MaxTextChars) bad("text cap")
            sb.append(cp.toChar)
            pendingSkip = cur.uc
          }
        case "bin" =>
          val len = if (hasNum) arg else 0
          if (len < 0 || p + len > n) bad(s"\\bin$len overrun")
          p += len
        case "ansicpg" =>
          // only the windows-1252 byte semantics are implemented; any
          // other declared page would mojibake every \'hh byte
          if (hasNum && arg != 1252) bad(s"unsupported codepage $arg")
        case d if SkipDests(d) => cur.skip = true
        case _ => () // unknown/formatting control words are inert
      }
    }

    while (p < n && !done) {
      (bytes(p) & 0xff).toChar match {
        case '{' =>
          stack = cur :: stack
          cur = new GroupState(cur.uc, cur.skip)
          depth += 1
          pendingSkip = 0 // a group boundary ends any fallback run
          p += 1
        case '}' =>
          if (depth == 0) bad("unbalanced close")
          cur = stack.head; stack = stack.tail
          depth -= 1
          pendingSkip = 0
          p += 1
          if (depth == 0) {
            // document group closed: trailing text (no final \par)
            if (sb.nonEmpty) { paras += sb.toString; sb.setLength(0) }
            var q = p
            while (q < n) {
              val c = bytes(q) & 0xff
              if (c != '\r' && c != '\n' && c != ' ' && c != '\t' && c != 0)
                bad("content after document group")
              q += 1
            }
            done = true
          }
        case '\\' =>
          if (p + 1 >= n) bad("dangling backslash")
          val c1 = (bytes(p + 1) & 0xff).toChar
          if (c1 == '\'') {
            if (p + 3 >= n) bad("truncated hex escape")
            val v = hex(bytes(p + 2)) * 16 + hex(bytes(p + 3))
            p += 4
            if (pendingSkip > 0) pendingSkip -= 1
            else if (!cur.skip) {
              if (sb.length >= MaxTextChars) bad("text cap")
              sb.append(cp1252(v))
            }
          } else if (c1 == '\\' || c1 == '{' || c1 == '}') {
            append(c1); p += 2
          } else if (c1 == '~') { append('\u00a0'); p += 2 }
          else if (c1 == '-') {
            // optional hyphen: no content, but it IS one fallback char
            if (pendingSkip > 0) pendingSkip -= 1
            p += 2
          } else if (c1 == '_') { append('\u2011'); p += 2 }
          else if (c1 == '*') { cur.skip = true; p += 2 }
          else if (c1.isLetter) controlWord()
          else bad(s"unknown control symbol \\$c1")
        case '\r' | '\n' | '\u0000' => p += 1 // source formatting, never content
        case c => append(c); p += 1
      }
    }
    if (!done) bad("unterminated document group")
    paras.result()
  }

  private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  private def hex(b: Byte): Int = {
    val c = b & 0xff
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else bad(s"bad hex digit ${c.toChar}")
  }

  /** windows-1252 byte → char; the five undefined bytes refuse (a
    * mojibake pass-through would corrupt silently). 0x80–0x9F carry the
    * same C1 remap the crawl-decode path uses.
    */
  private[ops] def cp1252(v: Int): Char = {
    if (v < 0x80) return v.toChar
    if (v >= 0xa0) return v.toChar // latin-1 range coincides
    C1(v - 0x80) match {
      case 0 => bad(f"byte 0x$v%02x undefined in windows-1252")
      case c => c
    }
  }

  private val C1: Array[Char] = Array(
    '\u20ac', 0, '\u201a', '\u0192', '\u201e', '\u2026', '\u2020', '\u2021',
    '\u02c6', '\u2030', '\u0160', '\u2039', '\u0152', 0, '\u017d', 0,
    0, '\u2018', '\u2019', '\u201c', '\u201d', '\u2022', '\u2013', '\u2014',
    '\u02dc', '\u2122', '\u0161', '\u203a', '\u0153', 0, '\u017e', '\u0178')

  // ---------------------------------------------------------------------------
  // Deterministic fixture
  // ---------------------------------------------------------------------------

  /** Logical paragraph text — the closed form both the Scala fixture
    * and the DuckDB oracle compute. Cadence mirrors the Docx fixture
    * family; the planted constructs exercise every extraction rule:
    * tab + brace/backslash escapes, `\u` + `\'hh` cp1252, `\line`
    * wrapping, and a `{\uc2 ...}` scoped-fallback group.
    */
  def logicalPara(docId: Long, i: Int): String = {
    val base = s"Rtf $i " +
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$docId|$i").substring(0, 12)
    val b = new StringBuilder(base)
    if (i % 3 == 0) b.append('\t').append("a{b}\\c")
    if (i % 4 == 1) b.append(' ').append('\u00e9').append('\u20ac')
    if (i % 5 == 2) b.append('\n').append("wrapped")
    if (i % 7 == 3) b.append('\u2211')
    b.toString
  }

  def paraCount(docId: Long): Int = 2 + (docId % 4).toInt

  /** A deterministic .rtf whose extracted text is exactly the
    * [[logicalPara]] sequence: plants fonttbl/colortbl/stylesheet
    * headers, a starred generator destination, an `\info` title, a
    * `\pict` with hex data AND a `\bin` run whose raw bytes include
    * `}` `\` `{` 0xFF (all must contribute nothing), raw source
    * newlines (ignored), and the per-paragraph constructs.
    */
  def syntheticRtf(docId: Long): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1\n")
    sb.append("{\\fonttbl{\\f0\\fswiss Helvetica;}{\\f1\\fmodern Courier;}}\n")
    sb.append("{\\colortbl;\\red255\\green0\\blue0;}\n")
    sb.append("{\\stylesheet{\\s0 Normal;}}\n")
    sb.append("{\\*\\generator Graft RTF fixture 1.0;}\n")
    sb.append("{\\info{\\title Trap title must not leak}}\n")
    val np = paraCount(docId)
    var i = 0
    while (i < np) {
      sb.append("\\pard\\f0 ")
      sb.append(s"Rtf $i " +
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$docId|$i").substring(0, 12))
      if (i % 3 == 0) sb.append("\\tab a\\{b\\}\\\\c")
      if (i % 4 == 1) sb.append(" \\u233?\\'80")
      if (i % 5 == 2) sb.append("\\line wrapped")
      if (i % 7 == 3) sb.append("{\\uc2\\u8721 xy}")
      if (i == np - 1 && docId % 2 == 0) {
        sb.append("{\\pict\\wmetafile8\\picw100\\pich100 0102}")
        sb.append("{\\pict\\bin4 }\\{\u00ff}")
      }
      sb.append("\\par\n")
      i += 1
    }
    sb.append("}")
    // ISO-8859-1 keeps the planted raw 0xFF byte a single byte
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}
