package graft.ops

/** HTML main-content extraction — the missing link in the Common Crawl
  * chain between [[Ingest.warcIngest]]'s HTTP body and the `documents`
  * table every downstream operator consumes: gzip member → WARC record →
  * HTTP envelope → **HTML → clean text**.
  *
  * One linear scan over the markup (no DOM, no allocation per tag):
  *
  *   - `script` / `style` / `noscript` / `template` content, comments,
  *     CDATA and declarations never become text;
  *   - block-level tags segment text into blocks, inline tags
  *     concatenate — the HTML rendering model;
  *   - character references decode (core named set + decimal/hex numeric;
  *     unknown or malformed references pass through literally, the
  *     browser behavior);
  *   - whitespace normalizes per block (runs collapse to one space,
  *     ends trimmed) — the CSS `white-space: normal` model;
  *   - boilerplate blocks drop by TWO deterministic rules, the JusText /
  *     trafilatura core reduced to what needs no language model:
  *     (1) semantic ancestry — anything inside `nav`/`header`/`footer`/
  *     `aside`; (2) link density — blocks whose anchor-text share exceeds
  *     [[Html.DenseLinkCut]], or exceeds [[Html.MixedLinkCut]] while the
  *     block is shorter than [[Html.ShortBlockChars]] chars ("Share —
  *     Tweet — Pin" bars, related-links strips, pagination).
  *
  * The `<title>` is captured separately (RCDATA: entities decode, tags do
  * not nest). Kept blocks join with `\n` — the page's reading order.
  *
  * Everything is deterministic, so the p86 oracle can regenerate the
  * expected clean text from the original `documents.text` in plain SQL
  * while the Spark side works on fully-mangled markup (entities,
  * whitespace runs, inline tags, attribute quoting, five boilerplate
  * blocks) produced by [[Html.wrapFixture]].
  *
  * Scale shape: a pure per-row string kernel — no state, no lookup
  * tables beyond compile-time sets — exposed as the codegen'd
  * `html_text` expression ([[graft.functions.HtmlText]]), so extraction
  * rides the scan inside whole-stage codegen with zero shuffle and no
  * UDF boundary. 100 TB of WARC decodes at input-partition parallelism.
  *
  * Reference behavior modeled: the reference ships no HTML extractor (its
  * corpus arrives pre-cleaned); this implements the standard public
  * semantics (WHATWG parsing subset + JusText-style pruning) that any
  * crawl pipeline feeding it would have run upstream.
  */
object Html {

  /** Drop a block when anchor text exceeds this share of its characters. */
  final val DenseLinkCut = 0.66
  /** With at least this anchor share AND fewer than [[ShortBlockChars]]
    * characters, a block is a link strip, not prose.
    */
  final val MixedLinkCut = 0.33
  final val ShortBlockChars = 40

  final case class Extracted(title: String, text: String, nKept: Int, nDropped: Int)

  /** Decode one character reference starting at `s(amp) == '&'`.
    * Returns (decoded text, index past the reference); anything malformed,
    * unterminated (no ';' within 12 chars), numerically out of range, or
    * unknown decodes as a literal '&' advancing one char — browser
    * recovery, never an exception.
    */
  private[graft] def decodeEntityAt(s: String, amp: Int): (String, Int) = {
    val n = s.length
    var j = amp + 1
    val lim = math.min(n, amp + 12)
    while (j < lim && s.charAt(j) != ';') j += 1
    if (j >= lim || j >= n || s.charAt(j) != ';' || j == amp + 1) return ("&", amp + 1)
    val body = s.substring(amp + 1, j)
    if (body.startsWith("#")) {
      val digits = body.substring(1)
      val cp =
        try {
          if (digits.length > 1 && (digits.charAt(0) == 'x' || digits.charAt(0) == 'X'))
            Integer.parseInt(digits.substring(1), 16)
          else Integer.parseInt(digits, 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 1 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
        (new String(Character.toChars(cp)), j + 1)
      else ("&", amp + 1)
    } else namedEntities.get(body) match {
      case Some(d) => (d, j + 1)
      case None => ("&", amp + 1)
    }
  }

  /** Tags that terminate the current text block (HTML block formatting
    * context, plus structural table/list parts and the forced breaks).
    */
  private val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "thead", "tbody", "tfoot", "caption",
    "blockquote", "pre", "section", "article", "main", "figure",
    "figcaption", "dl", "dt", "dd", "form", "fieldset", "address",
    "center", "details", "summary", "body", "html", "head",
    "hr", "br", "nav", "header", "footer", "aside")

  /** Semantic-boilerplate containers: rule (1). */
  private val boilerTags: Set[String] = Set("nav", "header", "footer", "aside")

  /** Content never rendered as text; skipped to the matching close tag. */
  private val rawTextTags: Set[String] = Set("script", "style", "noscript", "template")

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”")

  def extract(html: String): Extracted = {
    if (html == null) return Extracted("", "", 0, 0)
    val n = html.length
    val kept = Vector.newBuilder[String]
    var nKept = 0
    var nDropped = 0
    var title = ""
    var titleSet = false

    val block = new java.lang.StringBuilder(256)
    var nonWs = 0
    var linkNonWs = 0
    var boilerDepth = 0
    var anchorDepth = 0

    def appendDecoded(c: Char): Unit = {
      block.append(c)
      if (!Character.isWhitespace(c) && c != ' ') {
        nonWs += 1
        if (anchorDepth > 0) linkNonWs += 1
      }
    }

    def flush(): Unit = {
      val toks = block.toString.split("\\s+")
      val textB = {
        val sb = new java.lang.StringBuilder(block.length)
        var first = true
        toks.foreach { t =>
          if (t.nonEmpty) { if (!first) sb.append(' '); sb.append(t); first = false }
        }
        sb.toString
      }
      if (textB.nonEmpty) {
        val density = linkNonWs.toDouble / math.max(1, nonWs)
        val drop = boilerDepth > 0 ||
          density > DenseLinkCut ||
          (density >= MixedLinkCut && textB.length < ShortBlockChars)
        if (drop) nDropped += 1 else { kept += textB; nKept += 1 }
      }
      block.setLength(0); nonWs = 0; linkNonWs = 0
    }

    /** Index just past the closing '>' of a tag starting at `lt`, honoring
      * quoted attribute values (a '>' inside `data-x="a>b"` is data).
      */
    def tagEnd(lt: Int): Int = {
      var i = lt + 1
      var quote: Char = 0
      while (i < n) {
        val c = html.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return i + 1
        i += 1
      }
      n
    }

    /** Case-insensitive `</name` scan for rawtext elements; returns the
      * index of that '<' or `n` when unterminated (content then skipped to
      * EOF — the parse-error recovery browsers apply). Per the WHATWG
      * rawtext end-tag rule the name must be FOLLOWED by whitespace, '/'
      * or '>' — so `</scripts>` does not close `<script>`.
      */
    def findClose(from: Int, name: String): Int = {
      var i = from
      val needle = "</" + name
      while (i >= 0) {
        i = html.indexOf('<', i)
        if (i < 0) return n
        if (i + needle.length < n &&
          html.regionMatches(true, i, needle, 0, needle.length)) {
          val after = html.charAt(i + needle.length)
          if (after == '>' || after == '/' || Character.isWhitespace(after))
            return i
        }
        if (i >= 0) i += 1
      }
      n
    }

    def decodeEntity(s: String, amp: Int): (String, Int) =
      Html.decodeEntityAt(s, amp)

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val e = html.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = tagEnd(i) // <!DOCTYPE …>, processing instructions
        } else {
          var j = i + 1
          val isClose = j < n && html.charAt(j) == '/'
          if (isClose) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetter || html.charAt(j).isDigit)) j += 1
          if (j == nameStart) { appendDecoded('<'); i += 1 } // bare '<' is text
          else {
            val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            val end = tagEnd(i)
            val selfClosing = end - 2 >= i && html.charAt(math.max(i, end - 2)) == '/'
            // self-closing syntax is IGNORED on non-void elements (WHATWG):
            // `<script/>` still opens a rawtext element, so its content
            // never leaks into extracted text
            if (!isClose && rawTextTags.contains(name)) {
              i = tagEnd(findClose(end, name)) // drop content entirely
            } else if (!isClose && name == "title") {
              val close = findClose(end, "title")
              if (!titleSet) {
                val raw = html.substring(end, close)
                val sb = new java.lang.StringBuilder(raw.length)
                var k = 0
                while (k < raw.length) {
                  if (raw.charAt(k) == '&') {
                    val (txt, nk) = decodeEntity(raw, k)
                    sb.append(txt); k = nk
                  } else { sb.append(raw.charAt(k)); k += 1 }
                }
                title = sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
                titleSet = true
              }
              i = tagEnd(close)
            } else {
              if (blockTags.contains(name)) {
                flush()
                if (boilerTags.contains(name) && !selfClosing) {
                  if (isClose) boilerDepth = math.max(0, boilerDepth - 1)
                  else boilerDepth += 1
                }
              } else if (name == "a" && !selfClosing) {
                if (isClose) anchorDepth = math.max(0, anchorDepth - 1)
                else anchorDepth += 1
              }
              i = end
            }
          }
        }
      } else if (c == '&') {
        val (txt, next) = decodeEntity(html, i)
        var k = 0
        while (k < txt.length) { appendDecoded(txt.charAt(k)); k += 1 }
        i = next
      } else {
        appendDecoded(c)
        i += 1
      }
    }
    flush()
    Extracted(title, kept.result().mkString("\n"), nKept, nDropped)
  }

  // -------------------------------------------------------------------
  // Deterministic fixture wrapper (query + spec side)
  // -------------------------------------------------------------------

  /** splitmix64-style finalizer — the repo's fixture-noise generator. */
  private def mix(v: Long): Long = {
    var z = v
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Paragraphs of `wrapFixture`: tokens in chunks of 12 — mirrored by the
    * p86 oracle as list_slice over string_split.
    */
  final val ParagraphTokens = 12

  /** Boilerplate blocks the wrapper plants (h1, nav, aside, share strip,
    * footer) — every one must be DROPPED by extraction, asserted via the
    * literal `n_dropped` in the p86 oracle.
    */
  final val FixtureBoilerBlocks = 5

  /** Wrap a clean document into adversarial-but-deterministic HTML whose
    * extraction equals the whitespace-normalized original:
    * entity-mangled characters, whitespace runs, inline `<b>`/`<em>`
    * wraps, quoted-'>' attributes, a comment, script/style noise, and
    * [[FixtureBoilerBlocks]] boilerplate blocks spanning both drop rules.
    */
  def wrapFixture(docId: Long, source: String, text: String): String = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val paras = toks.grouped(ParagraphTokens).toArray
    val sb = new java.lang.StringBuilder(text.length * 2 + 1024)
    sb.append("<!DOCTYPE html>\n<html><head>\n")
    sb.append(s"<title>Doc $docId - ${escape(source)}</title>\n")
    sb.append("<style>.x{color:red} p>em{font-style:italic}</style>\n")
    sb.append(s"""<script>var noise = "<p>SCRIPT NOISE $docId</p>";</script>\n""")
    sb.append("</head>\n<body>\n<header>")
    sb.append(s"<h1>Example Site ${java.lang.Math.floorMod(docId, 7L)}</h1>")
    sb.append("""<nav><a href="/">Home</a> <a href="/crawl">Crawl</a> <a href="/about">About</a></nav>""")
    sb.append("</header>\n<!-- fixture comment: <p>not content</p> -->\n<main>\n")
    var pi = 0
    while (pi < paras.length) {
      val attr =
        if (java.lang.Math.floorMod(mix(docId * 31L + pi), 4L) == 0L)
          s""" class="para-$pi" data-x="a>b""""
        else ""
      sb.append(s"<p$attr>")
      val p = paras(pi)
      var j = 0
      while (j < p.length) {
        val h = mix(docId * 1000003L + pi * 8191L + j)
        val tok = escape(p(j))
        // numeric-entity mangle works on the full leading CODE POINT: a
        // UTF-16 unit would emit a lone-surrogate reference for non-BMP
        // leads, which decodeEntityAt rightly rejects. Isolated surrogates
        // (cp0 in the surrogate range) skip the mangle entirely.
        val cp0 = if (tok.nonEmpty) tok.codePointAt(0) else -1
        val cpOk = cp0 > 0 && !(cp0 >= 0xd800 && cp0 <= 0xdfff) && cp0 != '&'.toInt
        java.lang.Math.floorMod(h, 7L) match {
          case 0L => sb.append("<b>").append(tok).append("</b>")
          case 1L => sb.append("<em>").append(tok).append("</em>")
          case 2L if cpOk =>
            sb.append("&#").append(cp0).append(';')
              .append(tok.substring(Character.charCount(cp0)))
          case 3L if cpOk =>
            sb.append("&#x").append(Integer.toHexString(cp0))
              .append(';').append(tok.substring(Character.charCount(cp0)))
          case _ => sb.append(tok)
        }
        if (j < p.length - 1) {
          java.lang.Math.floorMod(h, 5L) match {
            case 0L => sb.append("\n      ")
            case 1L => sb.append("  \t ")
            case 2L => sb.append("&#32;")
            case _ => sb.append(' ')
          }
        }
        j += 1
      }
      sb.append("</p>\n")
      pi += 1
    }
    sb.append("</main>\n")
    sb.append("""<aside class="related"><a href="/r1">More one</a> <a href="/r2">More two</a></aside>""")
    sb.append("\n")
    sb.append("""<div class="share"><a href="#s">Share</a> <a href="#t">Tweet</a> <a href="#p">Pin</a></div>""")
    sb.append("\n<footer>&copy; 2026 example.com <a href=\"/terms\">Terms</a></footer>\n")
    sb.append("</body></html>\n")
    sb.toString
  }
}
