package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Markdown → plain-text extraction — the dominant DOCUMENTATION
  * modality in code corpora (every GitHub README/docs tree, wiki dumps,
  * static-site sources). Reference scope: the reference ships no
  * document extractors at all (it delegates scans to DuckDB —
  * `/root/reference/src` has no markdown reader); this op extends the
  * training-pipeline surface the same way ops/Rtf and ops/Html do.
  *
  * A from-scratch extractor over the CommonMark 0.31 + GFM grammar
  * subset that decides what SURVIVES into training text (deterministic,
  * oracle-able):
  *  - YAML front matter (`---` fence at line 0) is metadata, not text;
  *  - ATX headings lose their `#` runs (leading AND trailing closing
  *    sequence); setext underlines (`===`/`---`) drop, the heading line
  *    above survives as written;
  *  - fenced code blocks keep their content VERBATIM (code is training
  *    text; the classic naive bug runs inline rules over it and strips
  *    every `*` and `_` from source code) while the fence lines and
  *    info string drop; an unterminated fence runs to EOF (CommonMark);
  *    indented code blocks (4-space/tab, after a blank) dedent once;
  *  - blockquote `>` markers strip with nesting; list bullets
  *    (`-`/`+`/`*`) and ordered markers (`12.`/`12)`) strip;
  *  - GFM table rows become TAB-joined cells, delimiter rows
  *    (`| --- | :-: |`) drop;
  *  - thematic breaks and link-reference definitions drop;
  *  - inline: code spans protect their content verbatim (equal-length
  *    backtick-run matching), `[text](dest "title")` / `[text][ref]`
  *    keep only the text, `![alt](…)` keeps the alt, `<scheme://…>` and
  *    `<user@host>` autolinks keep the target, raw HTML tags drop,
  *    backslash-escaped ASCII punctuation becomes literal, HTML
  *    entities (named + `&#N;`/`&#xH;`) decode;
  *  - emphasis delimiters `*`/`_` (and GFM `~~`) are removed ONLY when
  *    a flanking-rule opener matches a closer — intraword underscores
  *    (`snake_case`) and unpaired runs stay literal text, so source
  *    code pasted outside fences is not mangled;
  *  - a bare `[text]` with no destination/ref stays literal (it is
  *    plain prose brackets, e.g. "[sic]", unless a definition exists);
  *  - hard-break markers (trailing spaces / trailing `\`) trim away.
  *
  * Markdown has no magic number and every byte sequence is valid input,
  * so unlike the binary estate there is no refusal channel: extraction
  * is TOTAL on strings (`\u0000` sanitizes to U+FFFD per CommonMark),
  * capped at [[MaxTextChars]] against pathological expansion.
  *
  * Scale note: per-row string work inside `mapPartitions` — shuffle-free
  * on top of the scan, same shape as the Rtf/Html paths.
  */
object Markdown {

  /** Output cap — entity/structure expansion cannot fill an executor heap. */
  private val MaxTextChars = 64 * 1024 * 1024

  // ---------------------------------------------------------------------------
  // Block pass
  // ---------------------------------------------------------------------------

  private val QuoteMarker = "^ {0,3}> ?".r
  private val ListMarker = "^ {0,3}(?:[-+*]|\\d{1,9}[.)])[ \\t]+".r
  private val AtxMarker = "^ {0,3}#{1,6}(?:[ \\t]+|$)".r
  private val AtxTrailing = "[ \\t]+#+[ \\t]*$".r
  private val RefDef = "^ {0,3}\\[[^\\]]*\\]:[ \\t]*\\S.*$".r
  private val TableDelimCell = ":?-+:?".r

  /** Extract plain text, one output line per surviving logical line. */
  def extractText(md: String): Vector[String] = {
    if (md == null) return Vector.empty
    val src = md.replace("\u0000", "\uFFFD")
    val lines = src.split("\n", -1).map { l =>
      if (l.nonEmpty && l.charAt(l.length - 1) == '\r') l.substring(0, l.length - 1)
      else l
    }
    val out = Vector.newBuilder[String]
    var total = 0L
    def emit(s: String): Unit = if (total < MaxTextChars) { out += s; total += s.length + 1 }

    var i = 0
    // YAML front matter: an exact `---` on the FIRST line, closed by
    // `---` or `...`; unterminated → not front matter (the opener is
    // then an ordinary thematic break).
    if (lines.length > 0 && lines(0).trim == "---" && lines(0).startsWith("---")) {
      var j = 1; var close = -1
      while (j < lines.length && close < 0) {
        val t = lines(j).trim
        if (t == "---" || t == "...") close = j
        j += 1
      }
      if (close > 0) i = close + 1
    }

    var fenceChar: Char = 0
    var fenceLen = 0
    var prevBlank = true
    var prevIndentedCode = false
    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      if (fenceChar != 0) {
        if (trimmed.nonEmpty && trimmed.forall(_ == fenceChar) &&
          trimmed.length >= fenceLen && line.indexOf(fenceChar) <= 3) {
          fenceChar = 0; prevBlank = true; prevIndentedCode = false
        } else emit(line)
        i += 1
      } else {
        val fence = fenceOpen(line)
        if (fence.isDefined) {
          fenceChar = fence.get._1; fenceLen = fence.get._2
          prevBlank = false; prevIndentedCode = false
        } else if (trimmed.isEmpty) {
          prevBlank = true; prevIndentedCode = false
        } else if (isRuleLine(trimmed)) {
          // setext underline or thematic break either way: not content
          prevBlank = true; prevIndentedCode = false
        } else if (RefDef.findFirstIn(line).isDefined) {
          prevBlank = false; prevIndentedCode = false
        } else if ((line.startsWith("    ") || line.startsWith("\t")) &&
          (prevBlank || prevIndentedCode)) {
          emit(if (line.startsWith("\t")) line.substring(1) else line.substring(4))
          prevBlank = false; prevIndentedCode = true
        } else {
          var s = line
          // nested blockquote markers
          var changed = true
          while (changed) {
            val r = QuoteMarker.replaceFirstIn(s, "")
            changed = r.length != s.length; s = r
          }
          // nested list markers (bounded: a bullet needs content after it)
          var depth = 0
          changed = true
          while (changed && depth < 4) {
            val r = ListMarker.replaceFirstIn(s, "")
            changed = r.length != s.length && r.trim.nonEmpty
            if (changed) { s = r; depth += 1 }
          }
          val st = s.trim
          if (st.startsWith("|")) {
            tableRow(s).foreach(emit)
          } else {
            val atx = AtxMarker.findFirstIn(s)
            if (atx.isDefined) {
              s = s.substring(atx.get.length)
              s = AtxTrailing.replaceFirstIn(s, "")
            }
            val res = trimEnds(inline(s, 0))
            if (res.nonEmpty) emit(res)
          }
          prevBlank = false; prevIndentedCode = false
        }
        i += 1
      }
    }
    out.result()
  }

  /** `(char, len)` when the line opens a code fence. A backtick fence's
    * info string may not contain a backtick (CommonMark); tilde info is
    * unrestricted.
    */
  private def fenceOpen(line: String): Option[(Char, Int)] = {
    var p = 0
    while (p < line.length && p <= 3 && line.charAt(p) == ' ') p += 1
    if (p >= line.length || p > 3) return None
    val c = line.charAt(p)
    if (c != '`' && c != '~') return None
    var q = p
    while (q < line.length && line.charAt(q) == c) q += 1
    val run = q - p
    if (run < 3) return None
    val info = line.substring(q)
    if (c == '`' && info.indexOf('`') >= 0) None else Some((c, run))
  }

  /** Setext underline (any-length `=`/`-` line) or thematic break
    * (3+ of `-`/`_`/`*`, spaces allowed). Both drop; a paragraph that
    * is literally all dashes is indistinguishable from a rule and is
    * treated as one (the CommonMark reading).
    */
  private def isRuleLine(trimmed: String): Boolean = {
    val squeezed = trimmed.filter(_ != ' ')
    if (squeezed.isEmpty) false
    else {
      val c = squeezed.charAt(0)
      if (!squeezed.forall(_ == c)) false
      else if (c == '=' || c == '-') true
      else (c == '*' || c == '_') && squeezed.length >= 3
    }
  }

  /** A GFM table row → TAB-joined inline-processed cells; None for the
    * delimiter row. Pipes escape with backslash; code spans are rare in
    * cells and are handled by the inline pass per cell.
    */
  private def tableRow(row: String): Option[String] = {
    val t = row.trim
    val cells = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == '\\' && i + 1 < t.length && t.charAt(i + 1) == '|') {
        cur.append('|'); i += 2
      } else if (c == '|') { cells += cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    cells += cur.toString
    // boundary pipes contribute empty first/last cells
    val inner0 = if (cells.nonEmpty && cells.head.trim.isEmpty) cells.tail else cells
    val inner = if (inner0.nonEmpty && inner0.last.trim.isEmpty) inner0.init else inner0
    if (inner.isEmpty) return None
    if (inner.forall(c => TableDelimCell.matches(c.trim))) return None
    Some(trimEnds(inner.map(c => inline(c, 0).trim).mkString("\t")))
  }

  private def trimEnds(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && (s.charAt(a) == ' ' || s.charAt(a) == '\t')) a += 1
    while (b > a && (s.charAt(b - 1) == ' ' || s.charAt(b - 1) == '\t')) b -= 1
    s.substring(a, b)
  }

  // ---------------------------------------------------------------------------
  // Inline pass
  // ---------------------------------------------------------------------------

  /** delimChar 0 = resolved literal text. */
  private final class Tok(var text: String, val delimChar: Char,
    val canOpen: Boolean, val canClose: Boolean)

  private val AutoUrl = "[A-Za-z][A-Za-z0-9+.-]*://[^\\s<>]+".r
  private val AutoMail = "[^\\s@<>]+@[^\\s@<>]+\\.[^\\s@<>]+".r
  private val HtmlTag = "/?[A-Za-z][A-Za-z0-9-]*(?:[ \\t][^>]*)?/?".r

  private def isAsciiPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
      (c >= '[' && c <= '`') || (c >= '{' && c <= '~')

  private[graft] def inline(s: String, depth: Int): String = {
    if (depth > 8) return s
    val n = s.length
    val toks = ArrayBuffer.empty[Tok]
    val text = new StringBuilder
    def flush(): Unit =
      if (text.nonEmpty) { toks += new Tok(text.toString, 0.toChar, false, false); text.clear() }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '\\' =>
          if (i + 1 >= n) i += 1 // hard-break marker at EOL
          else if (isAsciiPunct(s.charAt(i + 1))) { text.append(s.charAt(i + 1)); i += 2 }
          else { text.append('\\'); i += 1 }
        case '`' =>
          var j = i
          while (j < n && s.charAt(j) == '`') j += 1
          val run = j - i
          var k = j; var close = -1
          while (k < n && close < 0) {
            if (s.charAt(k) == '`') {
              var m = k
              while (m < n && s.charAt(m) == '`') m += 1
              if (m - k == run) close = k
              k = m
            } else k += 1
          }
          if (close >= 0) {
            flush()
            toks += new Tok(s.substring(j, close), 0.toChar, false, false)
            i = close + run
          } else { text.append(s.substring(i, j)); i = j }
        case '<' =>
          val gt = s.indexOf('>', i + 1)
          if (gt > i) {
            val inner = s.substring(i + 1, gt)
            if (AutoUrl.matches(inner) || AutoMail.matches(inner)) {
              flush(); toks += new Tok(inner, 0.toChar, false, false); i = gt + 1
            } else if (HtmlTag.matches(inner)) i = gt + 1
            else { text.append('<'); i += 1 }
          } else { text.append('<'); i += 1 }
        case '&' =>
          val ent = decodeEntity(s, i)
          if (ent == null) { text.append('&'); i += 1 }
          else { text.append(ent._1); i = ent._2 }
        case '!' if i + 1 < n && s.charAt(i + 1) == '[' =>
          val link = parseLink(s, i + 1)
          if (link == null) { text.append('!'); i += 1 }
          else {
            flush(); toks += new Tok(inline(link._1, depth + 1), 0.toChar, false, false)
            i = link._2
          }
        case '[' =>
          val link = parseLink(s, i)
          if (link == null) { text.append('['); i += 1 }
          else {
            flush(); toks += new Tok(inline(link._1, depth + 1), 0.toChar, false, false)
            i = link._2
          }
        case '*' | '_' | '~' =>
          var j = i
          while (j < n && s.charAt(j) == c) j += 1
          val run = j - i
          if (c == '~' && run != 2) { text.append(s.substring(i, j)); i = j }
          else {
            val prev = if (i == 0) ' ' else s.charAt(i - 1)
            val next = if (j >= n) ' ' else s.charAt(j)
            var canOpen = !Character.isWhitespace(next)
            var canClose = i > 0 && !Character.isWhitespace(prev)
            if (c == '_') {
              canOpen &&= !Character.isLetterOrDigit(prev)
              canClose &&= !(j < n && Character.isLetterOrDigit(next))
            }
            flush()
            toks += new Tok(s.substring(i, j), c, canOpen, canClose)
            i = j
          }
        case _ => text.append(c); i += 1
      }
    }
    flush()
    resolveEmphasis(toks)
    val sb = new StringBuilder
    toks.foreach(t => sb.append(t.text))
    sb.toString
  }

  /** Nearest-opener delimiter matching; unmatched runs stay literal.
    * Count mismatch consumes min(open, close) from each side, leftovers
    * render literally (the fixture-free generic behavior; CommonMark
    * would re-offer leftovers, a nuance that cannot change what TEXT
    * survives — only which delimiter chars leak, and leaking beats
    * eating prose).
    */
  private def resolveEmphasis(toks: ArrayBuffer[Tok]): Unit = {
    val open = ArrayBuffer.empty[Int] // indices of live openers
    var idx = 0
    while (idx < toks.length) {
      val t = toks(idx)
      if (t.delimChar != 0.toChar) {
        var matched = false
        if (t.canClose) {
          var k = open.length - 1
          while (k >= 0 && !matched) {
            val o = toks(open(k))
            if (o.delimChar == t.delimChar) {
              val used = math.min(o.text.length, t.text.length)
              o.text = o.text.substring(0, o.text.length - used)
              t.text = t.text.substring(0, t.text.length - used)
              if (o.text.isEmpty) open.remove(k) // fully consumed opener
              // any openers pushed after the matched one are dead scopes
              while (open.length > k + (if (o.text.isEmpty) 0 else 1))
                open.remove(open.length - 1)
              matched = true
            } else k -= 1
          }
        }
        if (!matched && t.canOpen) open += idx
      }
      idx += 1
    }
  }

  /** `([label, posAfterConstruct])` for `[label](dest)`, `[label][ref]`,
    * `[label][]`; null for a bare `[label]` (literal prose brackets) or
    * an unterminated bracket.
    */
  private def parseLink(s: String, start: Int): (String, Int) = {
    val n = s.length
    var i = start + 1
    var bracketDepth = 1
    while (i < n && bracketDepth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) i += 2
      else {
        if (c == '[') bracketDepth += 1
        else if (c == ']') bracketDepth -= 1
        i += 1
      }
    }
    if (bracketDepth != 0) return null
    val label = s.substring(start + 1, i - 1)
    if (i < n && s.charAt(i) == '(') {
      var j = i + 1
      var parenDepth = 1
      while (j < n && parenDepth > 0) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < n) j += 2
        else {
          if (c == '(') parenDepth += 1
          else if (c == ')') parenDepth -= 1
          j += 1
        }
      }
      if (parenDepth != 0) null else (label, j)
    } else if (i < n && s.charAt(i) == '[') {
      val rb = s.indexOf(']', i + 1)
      if (rb < 0) null else (label, rb + 1)
    } else null
  }

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00a0", "mdash" -> "\u2014", "ndash" -> "\u2013",
    "hellip" -> "\u2026", "rsquo" -> "\u2019", "lsquo" -> "\u2018",
    "ldquo" -> "\u201c", "rdquo" -> "\u201d", "copy" -> "\u00a9",
    "reg" -> "\u00ae", "trade" -> "\u2122", "middot" -> "\u00b7",
    "laquo" -> "\u00ab", "raquo" -> "\u00bb", "times" -> "\u00d7",
    "deg" -> "\u00b0", "sect" -> "\u00a7", "para" -> "\u00b6",
    "bull" -> "\u2022", "eacute" -> "\u00e9")

  /** `(decoded, posAfterSemicolon)`, or null when not an entity. */
  private def decodeEntity(s: String, at: Int): (String, Int) = {
    val semi = s.indexOf(';', at + 1)
    if (semi < 0 || semi - at > 32 || semi == at + 1) return null
    val name = s.substring(at + 1, semi)
    if (name.charAt(0) == '#') {
      val num = name.substring(1)
      val cp =
        try {
          if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
            Integer.parseInt(num.substring(1), 16)
          else Integer.parseInt(num)
        } catch { case _: NumberFormatException => -1 }
      if (cp <= 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) null
      else (new String(Character.toChars(cp)), semi + 1)
    } else NamedEntities.get(name) match {
      case Some(v) => (v, semi + 1)
      case None    => null
    }
  }

  // ---------------------------------------------------------------------------
  // Deterministic fixture with closed-form logical text (p151/s51 oracle)
  // ---------------------------------------------------------------------------

  private def md5(s: String): String =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  /** Per-class content lines beyond the fixed prelude. */
  def lineCount(docId: Long): Int = 3 + (docId % 4).toInt

  private def core(docId: Long, i: Int): String =
    "w" + md5(s"$docId|$i").take(10)

  private def cls(docId: Long, i: Int): Int = (((docId % 8) + i) % 8).toInt

  /** The markdown SOURCE form of content line `i`. */
  private[graft] def markdownLine(docId: Long, i: Int): String = {
    val c = core(docId, i)
    cls(docId, i) match {
      case 0 => s"### Lead $c snake_case ###"
      case 1 => s"**Bold** $c *ital* ~~and~~ _half_"
      case 2 => s"pre [$c link](https://example.org/$docId/$i \"t\") post"
      case 3 => s"> > deep $c quote  " // trailing spaces: hard-break marker
      case 4 => s"$i. item $c"
      case 5 => s"code `lit *$c*` span"
      case 6 => s"![alt $c](p.png) <https://example.org/a$i>"
      case 7 => "\\*" + c + "\\* &amp; &#x2211; &#233;"
    }
  }

  /** What content line `i` must extract to (the DuckDB oracle mirrors this). */
  def logicalLine(docId: Long, i: Int): String = {
    val c = core(docId, i)
    cls(docId, i) match {
      case 0 => s"Lead $c snake_case"
      case 1 => s"Bold $c ital and half"
      case 2 => s"pre $c link post"
      case 3 => s"deep $c quote"
      case 4 => s"item $c"
      case 5 => s"code lit *$c* span"
      case 6 => s"alt $c https://example.org/a$i"
      case 7 => "*" + c + "* & \u2211 \u00e9"
    }
  }

  /** The fixed prelude's extracted lines, in document order. */
  def preludeLines(docId: Long): Vector[String] = Vector(
    s"Doc $docId head ${md5(docId.toString).take(8)}",
    "val x = \"**" + docId + "**\" // fence",
    s"Setext $docId title",
    s"a$docId\tleft",
    s"right\tb$docId",
    s"html $docId tail",
    "See also here.",
    s"code indent $docId")

  /** Full expected extraction for a fixture doc. */
  def logicalText(docId: Long): Vector[String] =
    preludeLines(docId) ++ (0 until lineCount(docId)).map(logicalLine(docId, _))

  /** Deterministic markdown document exercising every block + inline
    * rule, whose extraction has the closed form [[logicalText]].
    */
  def syntheticMarkdown(docId: Long): String = {
    val h = md5(docId.toString).take(8)
    val sb = new StringBuilder
    sb.append("---\n")
    sb.append(s"title: Doc $docId\n")
    sb.append("tags: [alpha, beta]\n")
    sb.append("---\n")
    sb.append(s"# Doc $docId head $h\n\n")
    sb.append("```scala\n")
    sb.append("val x = \"**").append(docId).append("**\" // fence\n")
    sb.append("```\n\n")
    sb.append(s"Setext $docId title\n")
    sb.append("=================\n\n")
    sb.append("---\n\n")
    sb.append(s"| a$docId | left |\n")
    sb.append("| --- | ---: |\n")
    sb.append(s"| right | b$docId |\n\n")
    sb.append(s"""<span class="x">html $docId</span> tail""").append("\n\n")
    sb.append(s"""[ref]: https://example.org/$docId "t"""").append("\n")
    sb.append("See [also][ref] here.\n\n")
    sb.append(s"    code indent $docId\n\n")
    var i = 0
    val n = lineCount(docId)
    while (i < n) {
      sb.append(markdownLine(docId, i)).append("\n\n")
      i += 1
    }
    sb.toString
  }
}
