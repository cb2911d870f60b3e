package graft.ops

/** DOCX text extraction — after PDF, the most common document modality
  * in crawl corpora (VERDICT r11 #2). A .docx is a ZIP holding
  * `word/document.xml` (ECMA-376 WordprocessingML); both layers are
  * pure JDK work: `ZipInputStream` for the container, StAX for the XML.
  * Same design as [[Flac]]/[[Pdf]]: a strict decoder plus a
  * deterministic fixture generator whose logical text has a closed form
  * both engines can compute (exact-oracle-able), with an independent
  * Python mirror (`tools/check_docx_fixture.py`) re-parsing the emitted
  * bytes with zero shared code.
  *
  * Extraction semantics (deterministic, oracle-able):
  *  - `<w:t>` run text appends (XML entities decode in the parser);
  *  - `<w:tab/>` appends a TAB and `<w:br/>`/`<w:cr/>` a NEWLINE — but
  *    ONLY inside a `<w:r>` run: a `w:tab` under `<w:pPr><w:tabs>` is a
  *    tab-STOP DEFINITION, not content (the classic naive-walker bug;
  *    the fixture plants one to keep the distinction load-bearing);
  *  - each `<w:p>` paragraph is one line; paragraphs join with `\n`.
  *
  * Malformed input is DATA, not a crash: a broken zip, a missing
  * `word/document.xml`, or ill-formed XML returns None. The parser
  * refuses DTDs and external entities (no XXE from a crawl corpus) and
  * caps the inflated payload (zip bombs refuse loudly).
  *
  * Scale note: per-blob CPU work inside `mapPartitions` — shuffle-free,
  * scales with executor count like the PDF/image/audio paths.
  */
object Docx {

  /** Inflated-size cap for `word/document.xml` — a crawl-corpus zip
    * bomb refuses instead of filling an executor's heap.
    */
  private val MaxXmlBytes = 64 * 1024 * 1024

  private def documentXml(bytes: Array[Byte]): Option[Array[Byte]] =
    // container read through Opc.zipEntries: streaming walk first,
    // central-directory fallback for ZIP64/data-descriptor packages
    Opc.zipEntries(bytes, _ == "word/document.xml", MaxXmlBytes)
      .headOption.map(_._2)

  /** Paragraphs of `word/document.xml`, in document order. None on any
    * container/XML violation.
    */
  def extractText(bytes: Array[Byte]): Option[Vector[String]] = {
    if (bytes == null || bytes.length < 4 ||
      bytes(0) != 'P' || bytes(1) != 'K') return None
    try {
      documentXml(bytes).map { xml =>
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
        f.setProperty(
          javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
        val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
        val paras = Vector.newBuilder[String]
        val sb = new StringBuilder
        var inPara = false
        var runDepth = 0 // w:tab/w:br/w:t count only INSIDE a run
        var inT = false
        try {
          while (r.hasNext) {
            r.next() match {
              case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "p"   => inPara = true; sb.setLength(0)
                  case "r"   => runDepth += 1
                  case "t"   => if (runDepth > 0) inT = true
                  case "tab" => if (runDepth > 0) sb.append('\t')
                  case "br" | "cr" => if (runDepth > 0) sb.append('\n')
                  case _     => ()
                }
              case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "p" => if (inPara) { paras += sb.toString; inPara = false }
                  case "r" => runDepth -= 1
                  case "t" => inT = false
                  case _   => ()
                }
              case javax.xml.stream.XMLStreamConstants.CHARACTERS |
                   javax.xml.stream.XMLStreamConstants.CDATA =>
                if (inT) sb.append(r.getText)
              case _ => ()
            }
          }
        } finally r.close()
        paras.result()
      }
    } catch {
      case _: java.io.IOException => None                      // broken zip
      case _: javax.xml.stream.XMLStreamException => None      // ill-formed XML
      case _: IllegalArgumentException => None                 // cap / grammar
    }
  }

  // ------------------------------------------------------ fixture writer
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Closed-form logical paragraph (the contract the DuckDB oracle
    * re-derives): base text + a TAB-and-entities suffix every 3rd
    * paragraph (exercises `<w:tab/>` and `&amp;`/`&lt;` decoding) + an
    * in-paragraph line break every 5th (exercises `<w:br/>`).
    */
  private[graft] def logicalPara(seed: Long, i: Int): String = {
    val h = md5hex(s"$seed|$i").substring(0, 12)
    val s1 = if (i % 3 == 0) "\ta<b & c" else ""
    val s2 = if (i % 5 == 2) "\nwrapped x>y" else ""
    s"Para $i $h$s1$s2"
  }

  private[graft] def nParas(seed: Long): Int = 3 + (seed % 4).toInt

  /** Full logical document text: paragraphs joined by `\n`. */
  private[graft] def logicalText(seed: Long): String =
    (0 until nParas(seed)).map(i => logicalPara(seed, i)).mkString("\n")

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }

  /** One paragraph's WordprocessingML: text split across TWO runs (run
    * concatenation is load-bearing), tabs/breaks as their run-content
    * elements, spaces preserved via `xml:space`, and — every 4th
    * paragraph — a `<w:pPr><w:tabs><w:tab/></w:tabs></w:pPr>` tab-STOP
    * definition that contributes NO text.
    */
  private def paraXml(seed: Long, i: Int): String = {
    val full = logicalPara(seed, i)
    val sb = new StringBuilder("<w:p>")
    if (i % 4 == 1)
      sb.append("<w:pPr><w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/>" +
        "</w:tabs></w:pPr>")
    // split the paragraph on its control chars into run-content tokens
    def emit(chunk: String): Unit = if (chunk.nonEmpty) {
      // two runs per chunk: split at the midpoint
      val (a, b) = chunk.splitAt(chunk.length / 2)
      Seq(a, b).filter(_.nonEmpty).foreach { part =>
        sb.append("<w:r><w:t xml:space=\"preserve\">")
          .append(xmlEscape(part)).append("</w:t></w:r>")
      }
    }
    var rest = full
    while (rest.nonEmpty) {
      val cut = rest.indexWhere(c => c == '\t' || c == '\n')
      if (cut < 0) { emit(rest); rest = "" }
      else {
        emit(rest.substring(0, cut))
        sb.append(if (rest.charAt(cut) == '\t') "<w:r><w:tab/></w:r>"
          else "<w:r><w:br/></w:r>")
        rest = rest.substring(cut + 1)
      }
    }
    sb.append("</w:p>").toString
  }

  /** Deterministic fixture: `3 + seed%4` paragraphs in a minimal OPC
    * package ([Content_Types].xml + _rels/.rels + word/document.xml).
    * `extractText(syntheticDocx(s)).mkString("\n")` must round-trip
    * [[logicalText]] for every seed (DocxSpec; the p124 oracle
    * re-derives the same closed form in SQL).
    */
  def syntheticDocx(seed: Long): Array[Byte] = {
    val doc = new StringBuilder
    doc.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>")
      .append("<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
        "wordprocessingml/2006/main\"><w:body>")
    (0 until nParas(seed)).foreach(i => doc.append(paraXml(seed, i)))
    doc.append("<w:sectPr/></w:body></w:document>")
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/" +
        "content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
        "<Override PartName=\"/word/document.xml\" ContentType=\"application/" +
        "vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml\"/>" +
        "</Types>"
    val rels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/" +
        "2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/" +
        "officeDocument/2006/relationships/officeDocument\" " +
        "Target=\"word/document.xml\"/></Relationships>"
    val entries = Seq("[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rels,
      "docProps/core.xml" -> Opc.fixtureCoreXml("Docx", seed),
      "word/document.xml" -> doc.toString)
    // seed%6==1 documents ship as ZIP64 + data-descriptor STORED
    // containers — central-directory fallback load-bearing (VERDICT r12 #7)
    if (seed % 6 == 1)
      Opc.writeZip64(entries.map { case (nm, b) => nm -> b.getBytes("UTF-8") })
    else {
      val out = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(out)
      try {
        entries.foreach { case (name, body) =>
          val e = new java.util.zip.ZipEntry(name)
          e.setTime(0L) // fixed timestamp: fixture bytes are seed-pure
          zos.putNextEntry(e)
          zos.write(body.getBytes("UTF-8"))
          zos.closeEntry()
        }
      } finally zos.close()
      out.toByteArray
    }
  }
}
