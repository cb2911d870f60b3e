package graft

import graft.ops.{Html, Hygiene, MainContent}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.MainContent]]: DOM-aware main-content election
  * (readability/trafilatura class, VERDICT r12 #1) — container scoring,
  * subtree pruning, upward score propagation, and the line-for-line
  * agreement with the p98 corpus line-frequency path on the shared
  * fixture family.
  */
class MainContentSpec extends AnyFunSuite {

  test("fixture round-trips the closed-form content for 150 seeds") {
    (0L until 150L).foreach { id =>
      val src = s"host${id % 7}.example"
      val m = MainContent.extract(MainContent.fixture(id, src))
      assert(m.title === MainContent.logicalTitle(id, src), s"doc $id")
      assert(m.winner === "div.zone-a", s"doc $id")
      assert(m.nBlocks === MainContent.nParas(id), s"doc $id")
      assert(m.text === MainContent.logicalText(id), s"doc $id")
    }
  }

  test("link farm loses on density even when LONGER than the content") {
    // farm: 4 long all-anchor blocks (~400 chars); content: one short
    // paragraph (~40 chars). Density zeroes the farm; content wins.
    val farm = (1 to 4).map(k =>
      s"""<p><a href="/$k">${"storylink " * 10}end $k</a></p>""").mkString
    val html = s"""<body><div class="list">$farm</div>
      |<div class="prose"><p>Actual article text with enough characters here.</p></div>
      |</body>""".stripMargin
    val m = MainContent.extract(html)
    assert(m.winner === "div.prose")
    assert(m.text === "Actual article text with enough characters here.")
  }

  test("score propagates upward: an article split across sibling wrappers elects the parent") {
    val p1 = "First half of the article body with plenty of characters in it."
    val p2 = "Second half of the article body also with plenty of characters."
    val html = s"""<body><div class="outer">
      |<div class="col-1"><p>$p1</p></div>
      |<div class="col-2"><p>$p2</p></div>
      |</div></body>""".stripMargin
    val m = MainContent.extract(html)
    // the longer column wins the election; the sibling merge then pulls
    // the other column back in (5·score ≥ winnerScore) — the article
    // emits WHOLE, in document order
    assert(m.winner === "div.col-2")
    assert(m.text === s"$p1\n$p2", "the whole article, not one column")
    // a zero-scored link-farm sibling does NOT ride the merge
    val html2 = s"""<body><div class="outer">
      |<div class="col-1"><p>$p1</p></div>
      |<div class="farm"><p><a href="/">${"linktext " * 12}tail</a></p></div>
      |</div></body>""".stripMargin
    val m2 = MainContent.extract(html2)
    assert(m2.winner === "div.col-1")
    assert(m2.text === p1)
  }

  test("class/id boilerplate tokens prune whole subtrees") {
    val noise = "This prose is long enough to score if it were not pruned away."
    val keep = "Real content paragraph that must be the elected survivor here."
    for (attr <- Seq("""class="ad-box"""", """id="sidebar"""",
      """class="user comments"""", """class="promo_strip"""")) {
      val html = s"""<body><div $attr><p>$noise</p></div>
        |<div class="art"><p>$keep</p></div></body>""".stripMargin
      val m = MainContent.extract(html)
      assert(m.winner === "div.art", attr)
      assert(m.text === keep, attr)
    }
    // a class that merely CONTAINS a word as substring is NOT a token hit
    assert(MainContent.hasBoilerWord("advert zone") === true)
    assert(MainContent.hasBoilerWord("roadside") === false, "side != sidebar")
    assert(MainContent.hasBoilerWord("navigate") === false, "navigate != nav")
  }

  test("malformed markup is data: stray closes, unclosed elements, bare <") {
    assert(MainContent.extract(null) === MainContent.Main("", "", "", 0, 0))
    assert(MainContent.extract("").text === "")
    // unclosed div at EOF still elects; stray </section> is ignored
    val m = MainContent.extract(
      "<body></section><div class=a><p>Enough prose to win the election easily." )
    assert(m.winner === "div.a")
    assert(m.text === "Enough prose to win the election easily.")
    // bare '<' is text
    val m2 = MainContent.extract(
      "<body><div class=b><p>left < right is an inequality of some length.</p></div>")
    assert(m2.text === "left < right is an inequality of some length.")
  }

  test("no prose anywhere yields empty text, not a crash") {
    val m = MainContent.extract(
      """<body><div><p><a href="/">only links of considerable length here</a></p></div></body>""")
    assert(m.text === "")
    assert(m.winner === "")
    assert(m.nBlocks === 0)
  }

  test("differential vs the p98 line-frequency path on the shared fixture family") {
    // The same templated corpus through BOTH hygiene paths:
    //  - flat extraction (Html.extract) leaves the source-templated
    //    sidebar/comment lines in; the p98 corpus pass then strips what
    //    repeats across each source's docs;
    //  - the structural path elects div.zone-a per document, no corpus
    //    statistics at all.
    // They must agree line-for-line.
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = (0L until 16L).map(id => (id, s"src${id % 2}"))
    val pages = docs.map { case (id, src) =>
      (id, src, Html.extract(MainContent.fixture(id, src)).text)
    }.toDF("doc_id", "source", "page")
    // sanity: the flat path DID keep boilerplate (sidebar + comments)
    val flat0 = pages.where($"doc_id" === 0L).select($"page").head.getString(0)
    MainContent.boilerLines("src0").foreach(l =>
      assert(flat0.contains(l), s"flat path should keep '$l'"))
    val bp = Hygiene.boilerplateTable(pages, "source", "doc_id", "page")
    val cleaned = Hygiene.stripBoilerplate(pages, bp, "source", "doc_id", "page")
      .select($"doc".as[Long], $"clean".as[String]).collect().toMap
    docs.foreach { case (id, src) =>
      val structural = MainContent.extract(MainContent.fixture(id, src)).text
      assert(cleaned(id) === structural,
        s"doc $id: corpus-pass and structural paths disagree")
    }
  }
}
