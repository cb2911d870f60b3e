package graft

import graft.ops.Html
import org.scalatest.funsuite.AnyFunSuite

/** HTML main-content extraction contracts: the WHATWG-subset parse
  * (rawtext, comments, entities, attribute quoting), the block model,
  * the two boilerplate drop rules, and the fixture round-trip the p86
  * oracle depends on.
  */
class HtmlSpec extends AnyFunSuite {

  test("block model: block tags segment, inline tags concatenate") {
    val e = Html.extract(
      "<div>alpha <b>beta</b> gamma</div><p>delta</p><span>still delta? no — new doc text</span>")
    // span is inline but follows a closed <p>, so it extends the block
    // opened by </p>'s flush — blocks split only at block-level tags
    assert(e.nKept == 3)
    assert(e.text == "alpha beta gamma\ndelta\nstill delta? no — new doc text")
  }

  test("script/style/noscript/template content and comments never surface") {
    val e = Html.extract(
      """<style>p{x:1}</style><script>var a = "<p>fake</p>";</script>
        |<noscript><p>js off</p></noscript><template><p>tmpl</p></template>
        |<!-- <p>commented out</p> --><p>real</p>""".stripMargin)
    assert(e.text == "real", e.text)
    assert(e.nKept == 1)
  }

  test("entities: named, decimal, hex; malformed pass through literally") {
    val e = Html.extract(
      "<p>&amp;&lt;&gt;&quot;&apos;x&nbsp;y</p>" +
      "<p>&#65;&#x42;&#x1F600;</p>" +
      "<p>a &unknown; b &amp c &#xZZ; d &#; e &</p>")
    val lines = e.text.split("\n")
    assert(lines(0) == "&<>\"'x y")
    assert(lines(1) == "AB😀")
    assert(lines(2) == "a &unknown; b &amp c &#xZZ; d &#; e &")
  }

  test("whitespace collapses per block; blank blocks vanish") {
    val e = Html.extract("<p>  a \t\n  b  </p><p>   </p><div>\n</div><p>c</p>")
    assert(e.text == "a b\nc")
    assert(e.nKept == 2 && e.nDropped == 0)
  }

  test("rule 1: nav/header/footer/aside ancestry drops, nesting respected") {
    val e = Html.extract(
      "<header><h1>Site</h1><nav>Home About</nav></header>" +
        "<p>keep me because this block is prose long enough</p>" +
        "<aside><div><p>deeply nested related junk</p></div></aside>" +
        "<footer>fine print</footer>")
    assert(e.text == "keep me because this block is prose long enough")
    assert(e.nKept == 1 && e.nDropped == 4)
  }

  test("rule 2: link density — dense strips drop, prose with a link survives") {
    val dense = Html.extract(
      """<div><a href="#">Share</a> <a href="#">Tweet</a> <a href="#">Pin</a></div>""")
    assert(dense.nKept == 0 && dense.nDropped == 1)
    val prose = Html.extract(
      """<p>this paragraph has over forty characters and cites <a href="#">one link</a> inline</p>""")
    assert(prose.nKept == 1 && prose.nDropped == 0)
    // short + mixed-link ⇒ drop (pagination shape)
    val pager = Html.extract("""<div>page <a href="#2">2</a> <a href="#3">3</a></div>""")
    assert(pager.nKept == 0 && pager.nDropped == 1)
  }

  test("title: RCDATA capture, entity decode, first wins, not in body text") {
    val e = Html.extract(
      "<title>A &amp; B <not a tag></title><title>second</title><p>body</p>")
    assert(e.title == "A & B <not a tag>")
    assert(e.text == "body")
  }

  test("attribute quoting: '>' inside quoted values is data, not a tag end") {
    val e = Html.extract("""<p class="x" data-x="a>b" data-y='c>d'>content</p>""")
    assert(e.text == "content")
  }

  test("malformed input never throws: truncations, bare brackets, EOF tags") {
    val cases = Seq(
      "", "<", "<p", "<p>text", "<!--never closed", "<![CDATA[open",
      "<script>var x = 1;", "<title>open forever", "a < b and c > d",
      "<p>unclosed <b>bold <em>and em</p>", "&#xFFFFFFFF;", "&#55296;",
      "<a href='x'>link never closed <p>next block</p>")
    cases.foreach { c => Html.extract(c) } // must not throw
    assert(Html.extract("a < b and c > d").text == "a < b and c > d")
    // unterminated rawtext swallows to EOF (browser recovery)
    assert(Html.extract("<script>var x = 1;").text == "")
  }

  test("br and hr force block breaks") {
    val e = Html.extract("<p>one<br>two<br/>three<hr>four</p>")
    assert(e.text == "one\ntwo\nthree\nfour")
  }

  test("plain text is the identity (modulo whitespace normalization)") {
    val e = Html.extract("just ordinary text with no markup at all")
    assert(e.text == "just ordinary text with no markup at all")
    assert(e.nKept == 1 && e.nDropped == 0)
  }

  test("fixture round-trip: wrap → extract inverts exactly, all seeds") {
    // the p86 contract in miniature: extraction of the mangled wrapper
    // (entities, whitespace runs, inline wraps, quoted '>', 5 boilerplate
    // blocks) equals the original tokens re-chunked into paragraphs
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "window")
    def mix(v: Long): Long = {
      var z = v
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    for (id <- 0L until 60L) {
      val nTok = 10 + java.lang.Math.floorMod(mix(id + 77), 90L).toInt
      val toks = Array.tabulate(nTok)(j =>
        vocab(java.lang.Math.floorMod(mix(id * 131 + j), vocab.length.toLong).toInt))
      val text = toks.mkString(" ")
      val html = Html.wrapFixture(id, s"src${id % 5}", text)
      val e = Html.extract(html)
      val expected = toks.grouped(Html.ParagraphTokens).map(_.mkString(" ")).mkString("\n")
      assert(e.text == expected, s"doc $id")
      assert(e.title == s"Doc $id - src${id % 5}")
      assert(e.nKept == (nTok + Html.ParagraphTokens - 1) / Html.ParagraphTokens)
      assert(e.nDropped == Html.FixtureBoilerBlocks, s"doc $id dropped ${e.nDropped}")
    }
  }

  test("rawtext end tag requires a delimiter: </scripts> does not close <script>") {
    // WHATWG rawtext end-tag rule: the name must be followed by
    // whitespace, '/' or '>'. '</scripts>' is script DATA, not a close.
    val e = Html.extract(
      "<p>before</p><script>var a = 1; // </scripts> still code\n</script><p>after</p>")
    assert(e.text == "before\nafter", e.text)
    // same rule for RCDATA title: </titlefoo> does not end the title
    val t = Html.extract("<title>real </titlefoo> title</title><p>body</p>")
    assert(t.title == "real </titlefoo> title" || t.title == "real  title")
    // the spaced and attributed forms DO close it
    val s2 = Html.extract("<script>x</script ><p>a</p>")
    assert(s2.text == "a")
    val s3 = Html.extract("<script>x</script foo='1'><p>b</p>")
    assert(s3.text == "b")
  }

  test("self-closing syntax on rawtext tags is ignored: <script/> still opens") {
    // a browser treats the stray '/' as a parse error and opens the
    // element anyway — following text is script data, never content
    val e = Html.extract("<p>keep</p><script/>var leaked = 1;</script><p>kept too</p>")
    assert(e.text == "keep\nkept too", e.text)
    val s = Html.extract("<style/>p{color:red}</style><p>x</p>")
    assert(s.text == "x", s.text)
  }

  test("fixture numeric mangle encodes full code points, not UTF-16 units") {
    // a token leading with a non-BMP char (surrogate pair) must round-trip:
    // the mangle emits &#128512; (the code point), never a lone surrogate
    val text = "😀grin plain 😀grin plain " * 12
    val toks = text.trim.split(" ")
    var anyMangled = false
    for (id <- 0L until 20L) {
      val html = Html.wrapFixture(id, "s", text.trim)
      assert(!html.contains("&#55357;") && !html.contains("&#xd83d;"),
        s"doc $id emitted a lone surrogate reference")
      if (html.contains("&#128512;") || html.contains("&#x1f600;")) anyMangled = true
      val e = Html.extract(html)
      val expected = toks.grouped(Html.ParagraphTokens).map(_.mkString(" ")).mkString("\n")
      assert(e.text == expected, s"doc $id")
    }
    assert(anyMangled, "fixture never exercised the numeric mangle on the emoji lead")
  }

  test("fuzz: arbitrary tag-soup never throws, output bounded, extraction deterministic") {
    // deterministic pseudo-random soup of the parser's hard fragments:
    // unbalanced rawtext, half-open comments/CDATA, malformed entities,
    // quoted '>', self-closing syntax, non-ASCII, truncations
    val frags = Array("<p>", "</p>", "<script>", "</script>", "<a href='x'>",
      "</a>", "&amp;", "&#65;", "&#x1F600;", "&bogus;", "&#;", "<!--", "-->",
      "<![CDATA[", "]]>", "<div class=\"a>b\">", "text ", "<", ">", "&",
      "éé中文", "<title>", "</title>", "<br/>", "<script/>", "</scripts>",
      "\n\t ", "<p", "=\"", "'", "<nav>", "</nav>", "<style>", "p{c:r}")
    def mix(v: Long): Long = {
      var z = v
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    for (seed <- 0 until 400) {
      val n = 1 + (mix(seed.toLong) & 63).toInt
      val sb = new StringBuilder
      for (i <- 0 until n)
        sb.append(frags(java.lang.Math.floorMod(
          mix(seed * 131L + i), frags.length.toLong).toInt))
      val html = sb.toString
      val e = Html.extract(html) // must never throw
      // every transform (entity decode, whitespace collapse) shrinks or
      // preserves length — output can never exceed input
      assert(e.text.length <= html.length && e.title.length <= html.length, s"seed $seed")
      assert(e.nKept >= 0 && e.nDropped >= 0)
      assert(Html.extract(html) == e, s"seed $seed not deterministic")
    }
  }

  test("html_text SQL expression matches Html.extract and stays codegen'd") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    graft.functions.HtmlText.register(spark)
    val html = Html.wrapFixture(42L, "srcX", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi")
    val row = Seq(html).toDF("h")
      .selectExpr("html_text(h).title AS t", "html_text(h).text AS x",
        "html_text(h).n_kept AS k", "html_text(h).n_dropped AS d")
      .head()
    val direct = Html.extract(html)
    assert(row.getString(0) == direct.title && row.getString(1) == direct.text)
    assert(row.getInt(2) == direct.nKept && row.getInt(3) == direct.nDropped)
    // null in → null out
    val nulls = Seq(Option.empty[String]).toDF("h").selectExpr("html_text(h)").head()
    assert(nulls.isNullAt(0))
  }
}
