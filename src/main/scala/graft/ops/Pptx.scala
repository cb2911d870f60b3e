package graft.ops

/** PPTX text extraction — the third office modality after [[Docx]] and
  * [[Pdf]]: a .pptx is a ZIP holding one DrawingML document per slide
  * (`ppt/slides/slideN.xml`), text as `<a:t>` runs inside `<a:p>`
  * paragraphs. Same recipe: JDK-only decode (ZipInputStream + StAX,
  * DTD/XXE disabled), deterministic fixture with closed-form logical
  * text, exact oracle, independent Python mirror
  * (`tools/check_pptx_fixture.py`).
  *
  * Extraction semantics:
  *  - slides in their NUMERIC order (slide2 before slide10 — a lexical
  *    sort garbles decks past 9 slides), one string per slide;
  *  - `<a:t>` run text appends, `<a:br/>` is an in-paragraph newline,
  *    each `<a:p>` is one line;
  *  - ONLY `ppt/slides/slideN.xml` parts contribute: notes
  *    (`ppt/notesSlides/`), masters and layouts also carry `<a:t>` runs
  *    and must stay out (the fixture plants a notes part to keep the
  *    exclusion load-bearing).
  *
  * Malformed input is DATA (None): broken zip, no slides, ill-formed
  * XML. Per-blob mapPartitions work — shuffle-free at any scale.
  */
object Pptx {

  private val MaxXmlBytes = 64 * 1024 * 1024

  private val SlideName = "ppt/slides/slide(\\d+)\\.xml".r

  /** Slide xml parts in PRESENTATION order. When the deck carries
    * `ppt/presentation.xml` + its rels, the authored order is the
    * `<p:sldIdLst>` r:id sequence resolved through
    * `ppt/_rels/presentation.xml.rels` (ADVICE r12 — real decks with
    * renumbered parts extract wrongly under a numeric sort; a
    * referenced-but-missing slide part refuses). A package without a
    * presentation part falls back to numeric part order.
    */
  private def slideParts(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    // container read through Opc.zipEntries: streaming walk first,
    // central-directory fallback for ZIP64/data-descriptor packages
    val wanted = (n: String) => SlideName.pattern.matcher(n).matches() ||
      n == "ppt/presentation.xml" || n == "ppt/_rels/presentation.xml.rels"
    val parts = scala.collection.mutable.ArrayBuffer[(Int, String, Array[Byte])]()
    var pres: Option[Array[Byte]] = None
    var rels: Option[Array[Byte]] = None
    Opc.zipEntries(bytes, wanted, MaxXmlBytes).foreach {
      case (name @ SlideName(n), data) => parts += ((n.toInt, name, data))
      case ("ppt/presentation.xml", data) => pres = Some(data)
      case ("ppt/_rels/presentation.xml.rels", data) => rels = Some(data)
      case _ => ()
    }
    (pres, rels) match {
      case (Some(p), Some(r)) =>
        val byName = parts.map(e => e._2 -> e._3).toMap
        val ordered = Opc.orderedTargets(p, r, "sldId", "/slide", "ppt/")
          .map(name => byName.getOrElse(name,
            throw new IllegalArgumentException(s"sldIdLst names missing part $name")))
        if (ordered.isEmpty) None else Some(ordered)
      case (Some(_), None) =>
        // an authored order we cannot resolve: refuse loudly rather
        // than guess numeric
        throw new IllegalArgumentException("presentation.xml without its rels")
      case _ =>
        if (parts.isEmpty) None
        else Some(parts.sortBy(_._1).map(_._3).toSeq)
    }
  }

  private def slideText(xml: Array[Byte]): String = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
    val sb = new StringBuilder
    val para = new StringBuilder
    var inPara = false
    var inT = false
    var first = true
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "p"  => inPara = true; para.setLength(0)
              case "t"  => if (inPara) inT = true
              case "br" => if (inPara) para.append('\n')
              case _    => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "p" =>
                if (inPara) {
                  if (!first) sb.append('\n')
                  sb.append(para)
                  first = false
                  inPara = false
                }
              case "t" => inT = false
              case _   => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inT) para.append(r.getText)
          case _ => ()
        }
      }
    } finally r.close()
    sb.toString
  }

  /** Text of every slide, in numeric slide order. None on any
    * container/XML violation or a deck with no slides.
    */
  def extractText(bytes: Array[Byte]): Option[Vector[String]] = {
    if (bytes == null || bytes.length < 4 ||
      bytes(0) != 'P' || bytes(1) != 'K') return None
    try {
      slideParts(bytes).map(_.map(slideText).toVector)
    } catch {
      case _: java.io.IOException => None
      case _: javax.xml.stream.XMLStreamException => None
      case _: IllegalArgumentException => None
    }
  }

  // ------------------------------------------------------ fixture writer
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[graft] def nSlides(seed: Long): Int = 1 + (seed % 3).toInt

  private[graft] def nParas(seed: Long, s: Int): Int = 2 + ((seed + s) % 2).toInt

  /** Closed-form logical paragraph: base + an in-paragraph `<a:br/>`
    * line every 3rd (seed+s+i) and an entity suffix every 4th.
    */
  private[graft] def logicalPara(seed: Long, s: Int, i: Int): String = {
    val h = md5hex(s"$seed|$s|$i").substring(0, 12)
    val s1 = if ((seed + s + i) % 3 == 0) "\nbr&k" else ""
    val s2 = if ((seed + s + i) % 4 == 0) " a<b" else ""
    s"Slide $s para $i $h$s1$s2"
  }

  private[graft] def logicalSlide(seed: Long, s: Int): String =
    (0 until nParas(seed, s)).map(i => logicalPara(seed, s, i)).mkString("\n")

  /** seed%4==1 decks carry presentation.xml + rels whose sldIdLst
    * REVERSES the numeric part order — the authored order is the rels
    * order, so a numeric-sort extractor fails the oracle on this class.
    */
  private[graft] def relsOrdered(seed: Long): Boolean = seed % 4 == 1

  /** Slide indices in PRESENTATION order. */
  private[graft] def slideOrder(seed: Long): Seq[Int] =
    if (relsOrdered(seed)) (nSlides(seed) - 1) to 0 by -1
    else 0 until nSlides(seed)

  /** Full logical deck text: slides in presentation order, joined `\n`. */
  private[graft] def logicalText(seed: Long): String =
    slideOrder(seed).map(s => logicalSlide(seed, s)).mkString("\n")

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }

  private def slideXml(seed: Long, s: Int): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
      .append("<p:sld xmlns:a=\"http://schemas.openxmlformats.org/drawingml/" +
        "2006/main\" xmlns:p=\"http://schemas.openxmlformats.org/" +
        "presentationml/2006/main\"><p:cSld><p:spTree><p:sp><p:txBody>")
    for (i <- 0 until nParas(seed, s)) {
      val full = logicalPara(seed, s, i)
      sb.append("<a:p><a:pPr/>")
      var rest = full
      while (rest.nonEmpty) {
        val cut = rest.indexOf('\n')
        val chunk = if (cut < 0) rest else rest.substring(0, cut)
        // two runs per chunk (run concatenation load-bearing)
        val (x, y) = chunk.splitAt(chunk.length / 2)
        Seq(x, y).filter(_.nonEmpty).foreach { part =>
          sb.append("<a:r><a:rPr lang=\"en-US\"/><a:t>")
            .append(xmlEscape(part)).append("</a:t></a:r>")
        }
        if (cut < 0) rest = ""
        else { sb.append("<a:br/>"); rest = rest.substring(cut + 1) }
      }
      sb.append("</a:p>")
    }
    sb.append("</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
    sb.toString
  }

  /** Deterministic fixture: `1 + seed%3` slides written out of order in
    * the zip (slide2 part before slide1 — numeric ordering is
    * load-bearing), plus a `ppt/notesSlides/notesSlide1.xml` part whose
    * `<a:t>` runs must NOT leak into the extraction.
    */
  def syntheticPptx(seed: Long): Array[Byte] = {
    val n = nSlides(seed)
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/" +
        "content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    val notes =
      "<?xml version=\"1.0\"?><p:notes xmlns:a=\"http://schemas." +
        "openxmlformats.org/drawingml/2006/main\" xmlns:p=\"http://schemas." +
        "openxmlformats.org/presentationml/2006/main\"><p:cSld><p:spTree>" +
        "<p:sp><p:txBody><a:p><a:r><a:t>NOTES noise must not leak</a:t>" +
        "</a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld></p:notes>"
    // the rels-ordered class: presentation.xml lists slide parts in
    // REVERSED numeric order (rId{n+1}..rId2); rId1 is a notesSlide
    // relationship the type filter must skip
    val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val presentation =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<p:presentation xmlns:p=\"http://schemas.openxmlformats.org/" +
        s"""presentationml/2006/main" xmlns:r="$relNs"><p:sldIdLst>""" +
        (n to 1 by -1).map(k =>
          s"""<p:sldId id="${255 + k}" r:id="rId${k + 1}"/>""").mkString +
        "</p:sldIdLst></p:presentation>"
    val presRels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/" +
        "2006/relationships\">" +
        s"""<Relationship Id="rId1" Type="$relNs/notesSlide" """ +
        "Target=\"notesSlides/notesSlide1.xml\"/>" +
        (1 to n).map(k =>
          s"""<Relationship Id="rId${k + 1}" Type="$relNs/slide" """ +
            s"""Target="slides/slide$k.xml"/>""").mkString +
        "</Relationships>"
    val orderParts =
      if (relsOrdered(seed))
        Seq("ppt/presentation.xml" -> presentation,
          "ppt/_rels/presentation.xml.rels" -> presRels)
      else Seq.empty
    // slides enter the zip in REVERSE numeric order
    val entries =
      Seq("[Content_Types].xml" -> contentTypes,
        "docProps/core.xml" -> Opc.fixtureCoreXml("Pptx", seed)) ++ orderParts ++
        (n to 1 by -1).map(k => s"ppt/slides/slide$k.xml" -> slideXml(seed, k - 1)) ++
        Seq("ppt/notesSlides/notesSlide1.xml" -> notes)
    // seed%6==2 decks ship as ZIP64 + data-descriptor STORED containers
    // (the shape ZipInputStream refuses) — the central-directory
    // fallback is load-bearing on this class (VERDICT r12 #7)
    if (seed % 6 == 2)
      Opc.writeZip64(entries.map { case (nm, b) => nm -> b.getBytes("UTF-8") })
    else {
      val out = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(out)
      try {
        entries.foreach { case (name, body) =>
          val e = new java.util.zip.ZipEntry(name)
          e.setTime(0L)
          zos.putNextEntry(e)
          zos.write(body.getBytes("UTF-8"))
          zos.closeEntry()
        }
      } finally zos.close()
      out.toByteArray
    }
  }
}
