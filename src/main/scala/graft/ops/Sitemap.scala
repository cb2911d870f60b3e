package graft.ops

/** Sitemap ingestion (sitemaps.org protocol) — the other half of the
  * re-crawl seed story: [[Robots.parseRobotsMeta]] surfaces the
  * `Sitemap:` URLs a domain declares; this parses the documents those
  * URLs serve. Two document shapes share one grammar: `<urlset>` leaves
  * carry `<url><loc>` entries (with optional `<lastmod>`, `<changefreq>`,
  * `<priority>`), `<sitemapindex>` nodes carry `<sitemap><loc>` children
  * pointing at further sitemaps — a scheduler crawls the index, then the
  * leaves. StAX like [[Docx]] (JDK-only, DTD/external entities disabled),
  * ill-formed XML is DATA (None).
  *
  * Scale: parsing rides the scan of the (registry-sized) sitemap corpus
  * inside flatMap — no shuffle; the output URL list is the re-crawl
  * frontier.
  */
object Sitemap {

  /** One parsed entry: `kind` is "url" (leaf) or "sitemap" (index
    * child); `lastmod` in the document's own string form (W3C datetime
    * subset), None when absent.
    */
  final case class Entry(kind: String, loc: String, lastmod: Option[String])

  def parse(xml: String): Option[Vector[Entry]] = {
    if (xml == null) return None
    try {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(
        javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      val r = f.createXMLStreamReader(new java.io.StringReader(xml))
      val out = Vector.newBuilder[Entry]
      var rootSeen = false
      var kind: String = null       // "url" under urlset, "sitemap" under index
      var inEntry = false
      var field: String = null      // "loc" | "lastmod" while inside one
      var loc = new StringBuilder
      var lastmod = new StringBuilder
      try {
        while (r.hasNext) {
          r.next() match {
            case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "urlset" if !rootSeen      => rootSeen = true; kind = "url"
                case "sitemapindex" if !rootSeen => rootSeen = true; kind = "sitemap"
                case "url" | "sitemap" if rootSeen =>
                  inEntry = true; loc = new StringBuilder; lastmod = new StringBuilder
                case "loc" if inEntry     => field = "loc"
                case "lastmod" if inEntry => field = "lastmod"
                case _                    => field = null
              }
            case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "url" | "sitemap" if inEntry =>
                  inEntry = false
                  val l = loc.toString.trim
                  if (l.nonEmpty) out += Entry(kind, l,
                    Some(lastmod.toString.trim).filter(_.nonEmpty))
                case "loc" | "lastmod" => field = null
                case _ => ()
              }
            case javax.xml.stream.XMLStreamConstants.CHARACTERS |
                 javax.xml.stream.XMLStreamConstants.CDATA =>
              if (inEntry && field == "loc") loc.append(r.getText)
              else if (inEntry && field == "lastmod") lastmod.append(r.getText)
            case _ => ()
          }
        }
      } finally r.close()
      if (!rootSeen) None else Some(out.result())
    } catch {
      case _: javax.xml.stream.XMLStreamException => None
    }
  }

  /** Distributed parse of a (domain, xml) sitemap corpus:
    * (domain, kind, loc, lastmod) in document order. Parse rides the
    * scan; registry-sized output.
    */
  def entryTable(sitemaps: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = sitemaps.sparkSession
    import org.apache.spark.sql.functions.col
    import s.implicits._
    sitemaps.select(col("domain").cast("string"), col("xml").cast("string"))
      .as[(String, String)]
      .flatMap { case (dom, xml) =>
        parse(xml).getOrElse(Vector.empty)
          .map(e => (dom, e.kind, e.loc, e.lastmod.orNull))
      }
      .toDF("domain", "kind", "loc", "lastmod")
  }

  /** Deterministic fixture: variant `v % 4 == 3` is a SITEMAPINDEX with
    * two child sitemaps; the rest are urlsets of `2 + v % 3` URLs where
    * every second entry carries a lastmod date (day `1 + (v + i) % 28`
    * of 2025-01), entry 0 wraps its loc in CDATA (entity path), and an
    * `xhtml:link` foreign element plus changefreq/priority noise must
    * contribute nothing.
    */
  def fixtureSitemap(domain: String, v: Int): String = {
    if ((v & 3) == 3)
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
         |<sitemap><loc>https://$domain/sitemap-a.xml</loc>
         |<lastmod>2025-01-0${1 + (v % 9)}</lastmod></sitemap>
         |<sitemap><loc>https://$domain/sitemap-b.xml</loc></sitemap>
         |</sitemapindex>""".stripMargin
    else {
      val n = 2 + (v % 3)
      val urls = (0 until n).map { i =>
        val loc =
          if (i == 0) s"<loc><![CDATA[https://$domain/page-$i]]></loc>"
          else s"<loc>https://$domain/page-$i</loc>"
        val lm =
          if (i % 2 == 1) f"<lastmod>2025-01-${1 + (v + i) % 28}%02d</lastmod>"
          else ""
        s"<url>$loc$lm<changefreq>daily</changefreq>" +
          s"<priority>0.${1 + i}</priority>" +
          s"""<xhtml:link rel="alternate" href="https://$domain/alt-$i"/></url>"""
      }.mkString("\n")
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
         |        xmlns:xhtml="http://www.w3.org/1999/xhtml">
         |$urls
         |</urlset>""".stripMargin
    }
  }

  /** The child urlsets the index fixture's `<sitemap>` entries point at
    * (p134's recursive frontier): `sitemap-a.xml` lists two pages,
    * `sitemap-b.xml` one; any other URL is a fetch miss (None).
    */
  def fixtureChildSitemap(domain: String, loc: String): Option[String] = {
    def urlset(paths: Seq[String]): String =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
         |${paths.map(p => s"<url><loc>https://$domain/$p</loc></url>").mkString("\n")}
         |</urlset>""".stripMargin
    if (loc == s"https://$domain/sitemap-a.xml") Some(urlset(Seq("a-0", "a-1")))
    else if (loc == s"https://$domain/sitemap-b.xml") Some(urlset(Seq("b-0")))
    else None
  }

  /** Depth-bounded RECURSIVE expansion (VERDICT r12 #3): the leaf URLs
    * of `xml`, with `<sitemapindex>` children fetched through `fetch`
    * and recursed, in document order. An unresolvable child or nesting
    * past `maxDepth` refuses (None) — a cyclic or withheld index is
    * DATA, not a hang or a silently truncated frontier.
    */
  def expand(xml: String, fetch: String => Option[String],
             maxDepth: Int = 2): Option[Vector[String]] = {
    def go(x: String, depth: Int): Option[Vector[String]] =
      if (depth > maxDepth) None
      else parse(x).flatMap { es =>
        val parts: Vector[Option[Vector[String]]] = es.map {
          case Entry("url", loc, _)     => Some(Vector(loc))
          case Entry("sitemap", loc, _) => fetch(loc).flatMap(go(_, depth + 1))
          case _                        => Some(Vector.empty)
        }
        if (parts.exists(_.isEmpty)) None
        else Some(parts.flatMap(_.get))
      }
    go(xml, 0)
  }
}
