package graft.ops

/** XLSX cell-text extraction — the fourth office modality, completing
  * the crawl-document quartet ([[Pdf]]/[[Docx]]/[[Pptx]]). A .xlsx is a
  * ZIP holding `xl/worksheets/sheetN.xml` (SpreadsheetML cell grid) and
  * `xl/sharedStrings.xml` (the deduplicated string table string cells
  * INDEX into — the part a naive walker misses entirely, reading cell
  * `<v>` payloads as text and extracting nothing but integers). Same
  * recipe: JDK-only (ZipInputStream + StAX, DTD/XXE disabled),
  * deterministic fixture with closed-form logical text, exact oracle,
  * independent Python mirror (`tools/check_xlsx_fixture.py`).
  *
  * Extraction semantics (deterministic, oracle-able):
  *  - sheets in NUMERIC part order; per `<row>`, cell values join on
  *    TAB in document order; rows join on newline; sheets join on
  *    newline;
  *  - cell value by its `t` attribute: `s` → sharedStrings entry at the
  *    `<v>` index (a rich-text `<si>` concatenates ALL its `<t>` runs);
  *    `inlineStr` → the `<is>` text; `str` (formula result) and
  *    untyped/numeric → the raw `<v>` payload (no float re-formatting —
  *    byte-exact);
  *  - a shared-string index beyond the table REFUSES (a silently
  *    misaligned table would swap every string in the corpus).
  *
  * Malformed input is DATA (None). Per-blob mapPartitions —
  * shuffle-free at any scale.
  */
object Xlsx {

  private val MaxXmlBytes = 64 * 1024 * 1024

  private val SheetName = "xl/worksheets/sheet(\\d+)\\.xml".r

  private def readAll(zin: java.util.zip.ZipInputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var r = zin.read(buf)
    while (r >= 0) {
      if (out.size() + r > MaxXmlBytes)
        throw new IllegalArgumentException("part exceeds cap")
      out.write(buf, 0, r)
      r = zin.read(buf)
    }
    out.toByteArray
  }

  private def newReader(xml: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
  }

  /** The shared-string table: one entry per `<si>`, all `<t>` runs
    * concatenated (plain and rich-text entries alike).
    */
  private[graft] def parseSharedStrings(xml: Array[Byte]): Vector[String] = {
    val r = newReader(xml)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.setLength(0)
              case "t"  => if (inSi) inT = true
              case _    => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => if (inSi) { out += cur.toString; inSi = false }
              case "t"  => inT = false
              case _    => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  private def sheetText(xml: Array[Byte], sst: Vector[String]): String = {
    val r = newReader(xml)
    val sheet = new StringBuilder
    val cells = scala.collection.mutable.ArrayBuffer[String]()
    val v = new StringBuilder
    var firstRow = true
    var cellType: String = null
    var inCell = false
    var inV = false
    var inIsT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cells.clear()
              case "c" =>
                inCell = true; v.setLength(0)
                cellType = r.getAttributeValue(null, "t")
              case "v" => if (inCell) inV = true
              case "t" => if (inCell) inIsT = true // inside <is>
              case _   => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "c" =>
                if (inCell) {
                  val value = cellType match {
                    case "s" =>
                      val idx = v.toString.trim.toInt
                      if (idx < 0 || idx >= sst.size)
                        bad(s"shared-string index $idx beyond table of ${sst.size}")
                      sst(idx)
                    case "inlineStr" => v.toString
                    case _           => v.toString // str / numeric: raw payload
                  }
                  cells += value
                  inCell = false
                }
              case "v" => inV = false
              case "t" => inIsT = false
              case "row" =>
                if (!firstRow) sheet.append('\n')
                sheet.append(cells.mkString("\t"))
                firstRow = false
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inV || inIsT) v.append(r.getText)
          case _ => ()
        }
      }
    } finally r.close()
    sheet.toString
  }

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** Text of every sheet, in numeric part order. None on any container/
    * XML violation, a workbook with no sheets, or a dangling shared-
    * string index.
    */
  def extractText(bytes: Array[Byte]): Option[Vector[String]] = {
    if (bytes == null || bytes.length < 4 ||
      bytes(0) != 'P' || bytes(1) != 'K') return None
    try {
      // container read through Opc.zipEntries: streaming walk first,
      // central-directory fallback for ZIP64/data-descriptor packages
      val wanted = (n: String) => SheetName.pattern.matcher(n).matches() ||
        n == "xl/sharedStrings.xml" || n == "xl/workbook.xml" ||
        n == "xl/_rels/workbook.xml.rels"
      val sheets = scala.collection.mutable.ArrayBuffer[(Int, String, Array[Byte])]()
      var sstXml: Option[Array[Byte]] = None
      var wbXml: Option[Array[Byte]] = None
      var wbRels: Option[Array[Byte]] = None
      Opc.zipEntries(bytes, wanted, MaxXmlBytes).foreach {
        case (name @ SheetName(n), data) => sheets += ((n.toInt, name, data))
        case ("xl/sharedStrings.xml", data)       => sstXml = Some(data)
        case ("xl/workbook.xml", data)            => wbXml = Some(data)
        case ("xl/_rels/workbook.xml.rels", data) => wbRels = Some(data)
        case _ => ()
      }
      val sst = sstXml.map(parseSharedStrings).getOrElse(Vector.empty)
      // ADVICE r12: the authored sheet order is workbook.xml's <sheet>
      // r:id sequence through the workbook rels; numeric part order is
      // only the fallback for a package without a workbook part
      val ordered: Seq[Array[Byte]] = (wbXml, wbRels) match {
        case (Some(wb), Some(rl)) =>
          val byName = sheets.map(e => e._2 -> e._3).toMap
          Opc.orderedTargets(wb, rl, "sheet", "/worksheet", "xl/")
            .map(name => byName.getOrElse(name,
              bad(s"workbook names missing part $name")))
        case (Some(_), None) => bad("workbook.xml without its rels")
        case _               => sheets.sortBy(_._1).map(_._3).toSeq
      }
      if (ordered.isEmpty) None
      else Some(ordered.map(p => sheetText(p, sst)).toVector)
    } catch {
      case _: java.io.IOException => None
      case _: javax.xml.stream.XMLStreamException => None
      case _: IllegalArgumentException => None
      case _: NumberFormatException => None
    }
  }

  // ------------------------------------------------------ fixture writer
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private[graft] def nSheets(seed: Long): Int = 1 + (seed % 2).toInt
  private[graft] def nRows(seed: Long, s: Int): Int = 2 + ((seed + s) % 2).toInt

  /** Closed-form cell values for (sheet s, row r): col0 a shared string
    * keyed on `r % 2` (rows ≥ 2 REUSE indices — table dedup is
    * load-bearing), col1 a raw numeric payload, col2 cycles
    * inlineStr-with-entities / rich-text shared string / formula-result
    * by `(seed+s+r) % 3`.
    */
  private[graft] def cellValues(seed: Long, s: Int, r: Int): Seq[String] = {
    val c0 = s"Cell $s ${r % 2} " + md5hex(s"$seed|$s|${r % 2}").substring(0, 10)
    val c1 = ((seed + s + r) % 1000).toString
    val c2 = ((seed + s + r) % 3) match {
      case 0 => "in<line> &r"
      case 1 => "Rich " + md5hex(s"$seed|rich|$s|$r").substring(0, 6)
      case _ => "F" + ((seed * 7 + s + r) % 100)
    }
    Seq(c0, c1, c2)
  }

  private[graft] def logicalSheet(seed: Long, s: Int): String =
    (0 until nRows(seed, s)).map(r => cellValues(seed, s, r).mkString("\t"))
      .mkString("\n")

  /** seed%4==3 workbooks carry workbook.xml + rels whose <sheets> list
    * REVERSES the numeric part order (seed%4==3 ⇒ seed odd ⇒ 2 sheets,
    * so the reversal is always load-bearing) — a numeric-sort extractor
    * fails the oracle on this class (ADVICE r12).
    */
  private[graft] def relsOrdered(seed: Long): Boolean = seed % 4 == 3

  /** Sheet indices in WORKBOOK order. */
  private[graft] def sheetOrder(seed: Long): Seq[Int] =
    if (relsOrdered(seed)) (nSheets(seed) - 1) to 0 by -1
    else 0 until nSheets(seed)

  /** Full logical workbook text: sheets in workbook order, joined `\n`. */
  private[graft] def logicalText(seed: Long): String =
    sheetOrder(seed).map(s => logicalSheet(seed, s)).mkString("\n")

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c   => c.toString
    }

  /** Deterministic fixture: `1 + seed%2` sheets written in REVERSE part
    * order, string cells indexing a DEDUPLICATED sharedStrings table
    * (repeated col0 values share one `<si>`; rich-text entries split
    * across two `<t>` runs), inlineStr cells with entities, formula
    * (`t="str"`) and numeric cells as raw `<v>` payloads.
    */
  def syntheticXlsx(seed: Long): Array[Byte] = {
    val n = nSheets(seed)
    // shared-string table: insertion-ordered dedup over all string cells
    val order = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sstIdx(text: String): Int =
      order.getOrElseUpdate(text, order.size)
    val sheetXmls = (0 until n).map { s =>
      val rows = (0 until nRows(seed, s)).map { r =>
        val vs = cellValues(seed, s, r)
        val c0 = s"""<c r="A${r + 1}" t="s"><v>${sstIdx(vs(0))}</v></c>"""
        val c1 = s"""<c r="B${r + 1}"><v>${vs(1)}</v></c>"""
        val c2 = ((seed + s + r) % 3) match {
          case 0 =>
            s"""<c r="C${r + 1}" t="inlineStr"><is><t>${xmlEscape(vs(2))}</t></is></c>"""
          case 1 => s"""<c r="C${r + 1}" t="s"><v>${sstIdx(vs(2))}</v></c>"""
          case _ => s"""<c r="C${r + 1}" t="str"><v>${xmlEscape(vs(2))}</v></c>"""
        }
        s"""<row r="${r + 1}">$c0$c1$c2</row>"""
      }.mkString
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/" +
        s"spreadsheetml/2006/main\"><sheetData>$rows</sheetData></worksheet>"
    }
    val sis = order.keys.map { text =>
      if (text.startsWith("Rich ")) {
        // rich-text entry: two runs with formatting noise
        val (a, b) = text.splitAt(text.length / 2)
        s"<si><r><rPr><b/></rPr><t xml:space=\"preserve\">${xmlEscape(a)}</t></r>" +
          s"<r><t xml:space=\"preserve\">${xmlEscape(b)}</t></r></si>"
      } else s"<si><t xml:space=\"preserve\">${xmlEscape(text)}</t></si>"
    }.mkString
    val sst = "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      s"<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/" +
      s"main\" count=\"${order.size}\" uniqueCount=\"${order.size}\">$sis</sst>"
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/" +
        "content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    // the rels-ordered class: workbook.xml lists sheet parts in REVERSED
    // numeric order; rId1 is the sharedStrings relationship the type
    // filter must skip
    val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val workbook =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/" +
        s"""2006/main" xmlns:r="$relNs"><sheets>""" +
        (n to 1 by -1).map(k =>
          s"""<sheet name="S$k" sheetId="$k" r:id="rId${k + 1}"/>""").mkString +
        "</sheets></workbook>"
    val wbRels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/" +
        "2006/relationships\">" +
        s"""<Relationship Id="rId1" Type="$relNs/sharedStrings" """ +
        "Target=\"sharedStrings.xml\"/>" +
        (1 to n).map(k =>
          s"""<Relationship Id="rId${k + 1}" Type="$relNs/worksheet" """ +
            s"""Target="worksheets/sheet$k.xml"/>""").mkString +
        "</Relationships>"
    val orderParts =
      if (relsOrdered(seed))
        Seq("xl/workbook.xml" -> workbook,
          "xl/_rels/workbook.xml.rels" -> wbRels)
      else Seq.empty
    val entries =
      Seq("[Content_Types].xml" -> contentTypes,
        "docProps/core.xml" -> Opc.fixtureCoreXml("Xlsx", seed)) ++ orderParts ++
        (n to 1 by -1).map(k => s"xl/worksheets/sheet$k.xml" -> sheetXmls(k - 1)) ++
        Seq("xl/sharedStrings.xml" -> sst)
    // seed%6==4 workbooks ship as ZIP64 + data-descriptor STORED
    // containers — central-directory fallback load-bearing (VERDICT r12 #7)
    if (seed % 6 == 4)
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
