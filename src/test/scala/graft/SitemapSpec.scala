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
}
