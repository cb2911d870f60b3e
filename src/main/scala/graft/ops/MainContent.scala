package graft.ops

/** DOM-aware main-content extraction — the trafilatura/readability
  * class of per-document STRUCTURAL extraction (VERDICT r12 #1), the
  * complement of the two existing hygiene paths:
  *
  *   - [[Html.extract]] (p86) filters flat blocks by semantic ancestry
  *     and link density, but keeps every surviving block — a sidebar
  *     promo or a comment paragraph that is plain prose passes;
  *   - the p98 line-frequency pass removes text that REPEATS across a
  *     source's documents, but needs a corpus pass per source.
  *
  * This extractor works on ONE document, no corpus statistics: it
  * parses the markup into an element tree, prunes non-content subtrees,
  * scores the candidate CONTAINERS by the text they directly hold, and
  * emits the winning container's subtree — the readability election.
  *
  * Deterministic semantics (all closed-form oracle-able):
  *
  *  1. PRUNE — a subtree never contributes text when its root is a
  *     semantic non-content tag (`nav`/`header`/`footer`/`aside`/
  *     `form`), a rawtext tag (`script`/`style`/`noscript`/`template`),
  *     or carries a class/id ATTRIBUTE whose [a-z0-9]+ tokens hit
  *     [[BoilerWords]] (`sidebar`, `comments`, `promo`, …) — the
  *     trafilatura prune lists, token-matched (no regex on untrusted
  *     input; `robots_match` ADVICE r11 applies here too).
  *  2. BLOCKS — text segments on the block-tag rendering model (same
  *     tag set as [[Html.extract]]), whitespace-normalized per block;
  *     each block belongs to the NEAREST enclosing candidate element
  *     (`body`/`main`/`article`/`section`/`div`/`td`).
  *  3. SCORE — a block with ≥ [[MinBlockChars]] non-whitespace chars
  *     adds `max(0, chars − 3·anchorChars)` to its owner ([[LinkPenalty]]
  *     — a link farm scores zero however long); when a candidate closes
  *     it adds `score/2` to its enclosing candidate (readability's
  *     geometric upward propagation, so an article split across sibling
  *     wrappers elects the common parent).
  *  4. ELECT — the highest-scoring candidate wins, document order
  *     breaking ties (the parent OPENS first, so a parent tying its
  *     only child wins and nothing is lost); then readability's SIBLING
  *     MERGE: a candidate sharing the winner's parent joins the result
  *     when `5·score ≥ winnerScore` and `score > 0` — an article split
  *     across sibling column wrappers emits whole, while a zero-scored
  *     link-farm sibling stays out. The result text is every block
  *     owned by an included candidate or a candidate inside one, in
  *     document order. All-zero scores (no prose anywhere) yield empty
  *     text.
  *  5. TITLE — the `<title>` RCDATA, entity-decoded, ws-normalized.
  *
  * Malformed markup is DATA: stray close tags pop to the matching open
  * frame or are ignored; unclosed elements close at EOF (propagation
  * still runs); bare `<` is text — browser recovery, never an
  * exception. Scale shape: a pure per-row kernel behind the codegen'd
  * `html_main` expression ([[graft.functions.HtmlMain]]) — extraction
  * rides the scan at input parallelism, zero shuffle, no UDF boundary.
  *
  * Reference behavior modeled: the reference ships no structural
  * extractor (its corpus arrives pre-cleaned); these are the public
  * readability/trafilatura semantics any crawl pipeline runs upstream.
  */
object MainContent {

  /** Blocks below this many non-whitespace chars carry no score. */
  final val MinBlockChars = 25
  /** Anchor-text chars count this many times AGAINST a block's score. */
  final val LinkPenalty = 3

  /** Class/id tokens that mark a subtree as non-content. */
  final val BoilerWords: Set[String] = Set(
    "nav", "navbar", "menu", "sidebar", "footer", "header", "comment",
    "comments", "banner", "ad", "ads", "advert", "advertisement", "promo",
    "related", "share", "social", "breadcrumb", "breadcrumbs", "widget",
    "cookie", "popup", "masthead", "pagination")

  final case class Main(title: String, text: String, winner: String,
                        nBlocks: Int, nCandidates: Int)

  private val candTags = Set("body", "main", "article", "section", "div", "td")
  private val pruneTags = Set("nav", "header", "footer", "aside", "form")
  private val rawTextTags = Set("script", "style", "noscript", "template")
  private val voidTags = Set("br", "hr", "img", "meta", "link", "input",
    "area", "base", "col", "embed", "source", "track", "wbr", "param")
  private val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "table", "tr", "td", "th", "thead", "tbody", "tfoot", "caption",
    "blockquote", "pre", "section", "article", "main", "figure",
    "figcaption", "dl", "dt", "dd", "form", "fieldset", "address",
    "center", "details", "summary", "body", "html", "head",
    "hr", "br", "nav", "header", "footer", "aside")

  /** Does the attribute value carry a boilerplate token? Tokens are
    * maximal [a-zA-Z0-9]+ runs, lowercased — linear, no regex.
    */
  private[graft] def hasBoilerWord(v: String): Boolean = {
    if (v == null || v.isEmpty) return false
    var i = 0
    val n = v.length
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(v.charAt(i))) i += 1
      val s = i
      while (i < n && Character.isLetterOrDigit(v.charAt(i))) i += 1
      if (i > s && BoilerWords.contains(
        v.substring(s, i).toLowerCase(java.util.Locale.ROOT))) return true
    }
    false
  }

  /** (class, id) attribute values of the tag spanning [from, end). */
  private def classId(html: String, from: Int, end: Int): (String, String) = {
    var cls = ""
    var idv = ""
    var k = from
    val lim = end - 1 // exclude the '>'
    while (k < lim) {
      if (Character.isLetter(html.charAt(k))) {
        val ns = k
        while (k < lim && (Character.isLetterOrDigit(html.charAt(k)) ||
          html.charAt(k) == '-' || html.charAt(k) == '_')) k += 1
        val aname = html.substring(ns, k).toLowerCase(java.util.Locale.ROOT)
        while (k < lim && Character.isWhitespace(html.charAt(k))) k += 1
        var value = ""
        if (k < lim && html.charAt(k) == '=') {
          k += 1
          while (k < lim && Character.isWhitespace(html.charAt(k))) k += 1
          if (k < lim && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
            val q = html.charAt(k); k += 1
            val vs = k
            while (k < lim && html.charAt(k) != q) k += 1
            value = html.substring(vs, k)
            if (k < lim) k += 1
          } else {
            val vs = k
            while (k < lim && !Character.isWhitespace(html.charAt(k)) &&
              html.charAt(k) != '/') k += 1
            value = html.substring(vs, k)
          }
        }
        if (aname == "class") cls = value
        else if (aname == "id") idv = value
      } else k += 1
    }
    (cls, idv)
  }

  def extract(html: String): Main = {
    if (html == null) return Main("", "", "", 0, 0)
    val n = html.length

    final class Cand(val parent: Int, val sig: String) {
      var score: Long = 0L
    }
    val cands = scala.collection.mutable.ArrayBuffer[Cand]()
    val allBlocks = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    final case class Frame(tag: String, prune: Boolean, cand: Int, anchor: Boolean)
    var stack = List.empty[Frame]
    var pruneDepth = 0
    var anchorDepth = 0
    var curCand = -1

    var title = ""
    var titleSet = false

    val block = new java.lang.StringBuilder(256)
    var nonWs = 0
    var linkNonWs = 0

    def appendDecoded(c: Char): Unit = {
      block.append(c)
      if (!Character.isWhitespace(c)) {
        nonWs += 1
        if (anchorDepth > 0) linkNonWs += 1
      }
    }

    def flush(): Unit = {
      val toks = block.toString.split("\\s+")
      val sb = new java.lang.StringBuilder(block.length)
      var first = true
      toks.foreach { t =>
        if (t.nonEmpty) { if (!first) sb.append(' '); sb.append(t); first = false }
      }
      val text = sb.toString
      if (text.nonEmpty && pruneDepth == 0 && curCand >= 0) {
        allBlocks += ((curCand, text))
        if (nonWs >= MinBlockChars) {
          val s = nonWs.toLong - LinkPenalty.toLong * linkNonWs
          if (s > 0) cands(curCand).score += s
        }
      }
      block.setLength(0); nonWs = 0; linkNonWs = 0
    }

    def popFrame(f: Frame): Unit = {
      if (f.cand >= 0) {
        val c = cands(f.cand)
        curCand = c.parent
        if (c.parent >= 0) cands(c.parent).score += c.score / 2
      }
      if (f.prune) pruneDepth = math.max(0, pruneDepth - 1)
      if (f.anchor) anchorDepth = math.max(0, anchorDepth - 1)
    }

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
          i = tagEnd(i)
        } else {
          var j = i + 1
          val isClose = j < n && html.charAt(j) == '/'
          if (isClose) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetter || html.charAt(j).isDigit)) j += 1
          if (j == nameStart) { appendDecoded('<'); i += 1 }
          else {
            val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            val end = tagEnd(i)
            val selfClosing = end - 2 >= i && html.charAt(math.max(i, end - 2)) == '/'
            if (!isClose && rawTextTags.contains(name)) {
              i = tagEnd(findClose(end, name))
            } else if (!isClose && name == "title") {
              val close = findClose(end, "title")
              if (!titleSet) {
                val raw = html.substring(end, close)
                val sb = new java.lang.StringBuilder(raw.length)
                var k = 0
                while (k < raw.length) {
                  if (raw.charAt(k) == '&') {
                    val (txt, nk) = Html.decodeEntityAt(raw, k)
                    sb.append(txt); k = nk
                  } else { sb.append(raw.charAt(k)); k += 1 }
                }
                title = sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
                titleSet = true
              }
              i = tagEnd(close)
            } else if (isClose) {
              if (blockTags.contains(name)) flush()
              if (stack.exists(_.tag == name)) {
                var done = false
                while (!done && stack.nonEmpty) {
                  val f = stack.head; stack = stack.tail
                  popFrame(f)
                  if (f.tag == name) done = true
                }
              }
              i = end
            } else {
              if (blockTags.contains(name)) flush()
              val (cls, idv) = classId(html, j, end)
              val pruned = pruneTags.contains(name) ||
                hasBoilerWord(cls) || hasBoilerWord(idv)
              val isVoid = voidTags.contains(name) || selfClosing
              if (!isVoid) {
                var candIdx = -1
                if (!pruned && pruneDepth == 0 && candTags.contains(name)) {
                  val sig = name +
                    (if (cls.nonEmpty) "." + cls
                     else if (idv.nonEmpty) "#" + idv else "")
                  candIdx = cands.length
                  cands += new Cand(curCand, sig)
                  curCand = candIdx
                }
                if (pruned) pruneDepth += 1
                stack ::= Frame(name, pruned, candIdx, name == "a")
                if (name == "a") anchorDepth += 1
              }
              i = end
            }
          }
        }
      } else if (c == '&') {
        val (txt, next) = Html.decodeEntityAt(html, i)
        var k = 0
        while (k < txt.length) { appendDecoded(txt.charAt(k)); k += 1 }
        i = next
      } else {
        appendDecoded(c)
        i += 1
      }
    }
    flush()
    while (stack.nonEmpty) { val f = stack.head; stack = stack.tail; popFrame(f) }

    // election
    var winner = -1
    var best = 0L
    var k = 0
    while (k < cands.length) {
      if (cands(k).score > best) { best = cands(k).score; winner = k }
      k += 1
    }
    if (winner < 0) Main(title, "", "", 0, cands.length)
    else {
      val wParent = cands(winner).parent
      val roots: Set[Int] = cands.indices.filter { idx =>
        idx == winner || (cands(idx).parent == wParent &&
          cands(idx).score > 0 && 5L * cands(idx).score >= best)
      }.toSet
      def included(idx: Int): Boolean = {
        var p = idx
        while (p >= 0) {
          if (roots.contains(p)) return true
          p = cands(p).parent
        }
        false
      }
      val emitted = allBlocks.filter(b => included(b._1)).map(_._2)
      Main(title, emitted.mkString("\n"), cands(winner).sig,
        emitted.size, cands.length)
    }
  }

  // -------------------------------------------------------------------
  // Deterministic fixture (query + spec side)
  // -------------------------------------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[graft] def nParas(docId: Long): Int = 3 + (docId % 3).toInt

  /** Closed-form content paragraph `i` — unique per document, ≥
    * [[MinBlockChars]] non-ws chars; every (docId+i)%3==0 paragraph
    * carries an inline link whose text `ref i` joins the block.
    */
  private[graft] def logicalPara(docId: Long, i: Int): String = {
    val h = md5hex(s"$docId|$i").substring(0, 12)
    val link = if ((docId + i) % 3 == 0) s" ref $i" else ""
    s"Doc $docId para $i $h lorem ipsum dolor sit amet$link"
  }

  private[graft] def logicalText(docId: Long): String =
    (0 until nParas(docId)).map(i => logicalPara(docId, i)).mkString("\n")

  private[graft] def logicalTitle(docId: Long, source: String): String =
    s"Doc $docId :: $source"

  /** The SOURCE-templated boilerplate lines the fixture plants — the
    * lines the p98 corpus pass discovers (identical on every page of a
    * source) and this extractor's structural rules drop per document.
    * Order: sidebar promo, comment 1, comment 2 (the nav/link-farm/
    * footer lines never survive even the flat [[Html.extract]]).
    */
  private[graft] def boilerLines(source: String): Seq[String] = {
    val h = md5hex(source).substring(0, 8)
    Seq(s"Subscribe to the $source newsletter $h",
      s"Great post thanks $h", s"I disagree entirely $h")
  }

  /** Templated page: title, pruned header/nav, a link-farm zone
    * (density must zero it), a token-pruned sidebar and comments
    * section, the content container `div.zone-a`, and a footer. The
    * extractor must elect `div.zone-a` and emit exactly the closed-form
    * paragraphs.
    */
  def fixture(docId: Long, source: String): String = {
    val h = md5hex(source).substring(0, 8)
    val bl = boilerLines(source)
    val sb = new java.lang.StringBuilder(2048)
    sb.append("<!DOCTYPE html>\n<html><head>\n")
    sb.append(s"<title>Doc $docId :: $source</title>\n")
    sb.append(s"""<script>var x = "<p>noise $docId</p>";</script>\n""")
    sb.append("<style>.zone-a{margin:0}</style>\n")
    sb.append("</head>\n<body>\n")
    sb.append(s"""<header><h1>Portal $h</h1><nav><a href="/">Home $h</a> """)
    sb.append(s"""<a href="/arch">Archive $h</a></nav></header>\n""")
    // the link farm: one long block, 100% anchor text — NOT pruned by
    // tag or token, must lose on density alone
    sb.append("""<div class="zone-b"><p>""")
    (1 to 4).foreach(k => sb.append(
      s"""<a href="/top$k">Top story $h number $k</a> """))
    sb.append("</p></div>\n")
    sb.append(s"""<div id="sidebar"><p>${bl.head}</p></div>\n""")
    sb.append("""<div class="zone-a">""").append('\n')
    (0 until nParas(docId)).foreach { i =>
      val h2 = md5hex(s"$docId|$i").substring(0, 12)
      sb.append(s"<p>Doc $docId para $i $h2 lorem ipsum dolor sit amet")
      if ((docId + i) % 3 == 0) sb.append(s""" <a href="/r$i">ref $i</a>""")
      sb.append("</p>\n")
    }
    sb.append("</div>\n")
    sb.append(s"""<div class="comments"><p>${bl(1)}</p><p>${bl(2)}</p></div>\n""")
    sb.append(s"""<footer><p>&copy; 2026 $source <a href="/t">Terms</a></p></footer>\n""")
    sb.append("</body></html>\n")
    sb.toString
  }
}
