package graft

import graft.ops.Sitemap
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Sitemap]]: urlset/sitemapindex grammar, CDATA locs,
  * foreign-namespace noise, refusal on ill-formed XML.
  */
class SitemapSpec extends AnyFunSuite {

  test("urlset fixture round-trips the closed form (CDATA, lastmod cadence)") {
    (0 to 2).foreach { v =>
      val es = Sitemap.parse(Sitemap.fixtureSitemap("ex.org", v)).get
      assert(es.size === 2 + v % 3, s"variant $v")
      es.zipWithIndex.foreach { case (e, i) =>
        assert(e.kind === "url")
        assert(e.loc === s"https://ex.org/page-$i", "CDATA loc decodes")
        if (i % 2 == 1)
          assert(e.lastmod === Some(f"2025-01-${1 + (v + i) % 28}%02d"))
        else assert(e.lastmod === None)
      }
    }
  }

  test("sitemapindex yields child-sitemap pointers") {
    val es = Sitemap.parse(Sitemap.fixtureSitemap("ex.org", 3)).get
    assert(es.map(_.kind).distinct === Vector("sitemap"))
    assert(es.map(_.loc) === Vector("https://ex.org/sitemap-a.xml",
      "https://ex.org/sitemap-b.xml"))
    assert(es(0).lastmod === Some("2025-01-04") && es(1).lastmod === None)
  }

  test("noise elements contribute nothing; malformed input refuses") {
    // changefreq/priority/xhtml:link text must never leak into loc
    val es = Sitemap.parse(Sitemap.fixtureSitemap("ex.org", 0)).get
    assert(es.forall(e => !e.loc.contains("daily") && !e.loc.contains("alt")))
    assert(Sitemap.parse(null).isEmpty)
    assert(Sitemap.parse("<urlset><url><loc>x</loc>").isEmpty, "unclosed XML")
    assert(Sitemap.parse("<other><url><loc>x</loc></url></other>").isEmpty,
      "a document whose root is neither urlset nor sitemapindex refuses")
    // entries with an empty loc are dropped
    assert(Sitemap.parse(
      "<urlset><url><lastmod>2025-01-01</lastmod></url></urlset>")
      === Some(Vector()))
  }

  test("expand recurses sitemapindex children, depth-bounded, fetch-miss refuses") {
    val fetch = (loc: String) => Sitemap.fixtureChildSitemap("ex.org", loc)
    // index variant: two children expand to a-0, a-1, b-0 in doc order
    assert(Sitemap.expand(Sitemap.fixtureSitemap("ex.org", 3), fetch)
      === Some(Vector("https://ex.org/a-0", "https://ex.org/a-1",
        "https://ex.org/b-0")))
    // a urlset expands to its own locs
    assert(Sitemap.expand(Sitemap.fixtureSitemap("ex.org", 1), fetch)
      === Some(Vector("https://ex.org/page-0", "https://ex.org/page-1",
        "https://ex.org/page-2")))
    // a child the fetch cannot resolve refuses the WHOLE frontier (a
    // silently truncated frontier is worse than a loud miss)
    assert(Sitemap.expand(Sitemap.fixtureSitemap("ex.org", 3),
      _ => None).isEmpty)
    // a cyclic index is DATA: self-referential child exceeds maxDepth
    val cyclic = """<sitemapindex><sitemap><loc>https://ex.org/self.xml</loc>
      |</sitemap></sitemapindex>""".stripMargin
    assert(Sitemap.expand(cyclic, _ => Some(cyclic)).isEmpty)
  }
}
