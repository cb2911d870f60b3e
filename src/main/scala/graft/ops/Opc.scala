package graft.ops

/** Shared OPC (Open Packaging Conventions) plumbing for the office
  * extractors ([[Docx]]/[[Pptx]]/[[Xlsx]]): the `.rels` relationship
  * parts that define the AUTHORED part order. ADVICE r12:
  * deriving slide/sheet order from numeric part names (`slideN.xml`)
  * extracts renumbered or reordered real-world decks in the wrong
  * order — OOXML's source of truth is `presentation.xml`'s
  * `<p:sldIdLst>` (resp. `workbook.xml`'s `<sheets>`) whose `r:id`
  * attributes resolve through the rels part to the actual targets.
  *
  * JDK-only StAX, DTD/XXE disabled, same as every office walker here.
  */
object Opc {

  private[ops] def newReader(xml: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
  }

  /** One relationship: its /rels `Type` URI and the `Target` part. */
  final case class Rel(relType: String, target: String)

  /** Parse a `.rels` part: Id → (Type, Target), duplicate Ids refuse
    * (a silently-shadowed relationship would reorder the document).
    */
  def parseRels(xml: Array[Byte]): Map[String, Rel] = {
    val r = newReader(xml)
    val m = scala.collection.mutable.LinkedHashMap[String, Rel]()
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val ty = r.getAttributeValue(null, "Type")
          val tg = r.getAttributeValue(null, "Target")
          if (id == null || ty == null || tg == null)
            throw new IllegalArgumentException("relationship missing Id/Type/Target")
          if (m.contains(id))
            throw new IllegalArgumentException(s"duplicate relationship id $id")
          m(id) = Rel(ty, tg)
        }
      }
    } finally r.close()
    m.toMap
  }

  /** The `r:id` attribute values of every `<child>` element inside the
    * document part, in DOCUMENT order — the authored slide/sheet order.
    * The attribute is matched by LOCAL name `id` in the relationships
    * namespace (any prefix).
    */
  def orderedRefIds(xml: Array[Byte], child: String): Vector[String] = {
    val r = newReader(xml)
    val out = Vector.newBuilder[String]
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == child) {
          var found: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            val ns = r.getAttributeNamespace(i)
            if (r.getAttributeLocalName(i) == "id" && ns != null &&
              ns.endsWith("/relationships")) found = r.getAttributeValue(i)
            i += 1
          }
          if (found == null)
            throw new IllegalArgumentException(s"<$child> without an r:id")
          out += found
        }
      }
    } finally r.close()
    out.result()
  }

  /** Resolve a rels `Target` against the source part's base directory
    * (`ppt/` for presentation.xml, `xl/` for workbook.xml): absolute
    * (`/ppt/slides/...`) strips the slash, relative prepends the base,
    * and a leading `./` is dropped.
    */
  def resolveTarget(base: String, target: String): String =
    if (target.startsWith("/")) target.substring(1)
    else if (target.startsWith("./")) base + target.substring(2)
    else base + target

  /** The ordered part names the document part's `<child>` list refers
    * to: r:ids in document order, each resolved through the rels map,
    * filtered to `relType` (a suffix like "/slide" — rels Type URIs end
    * with the kind). A referenced id missing from the rels, or of the
    * wrong type, refuses — a dropped slide would silently truncate the
    * corpus text.
    */
  def orderedTargets(docXml: Array[Byte], relsXml: Array[Byte],
                     child: String, relTypeSuffix: String,
                     base: String): Vector[String] = {
    val rels = parseRels(relsXml)
    orderedRefIds(docXml, child).map { id =>
      val rel = rels.getOrElse(id,
        throw new IllegalArgumentException(s"r:id $id has no relationship"))
      if (!rel.relType.endsWith(relTypeSuffix))
        throw new IllegalArgumentException(
          s"r:id $id resolves to ${rel.relType}, wanted *$relTypeSuffix")
      resolveTarget(base, rel.target)
    }
  }

  // ----------------------------------------------------------- containers
  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) bad("zip record beyond file")
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) bad("zip record beyond file")
    (u16(b, o) & 0xffffL) | ((u16(b, o + 2) & 0xffffL) << 16)
  }
  private def u64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)

  /** Streaming walk of the zip: (name, bytes) for entries `want`
    * accepts, in archive order. Cheap path — one pass, no directory.
    */
  private def streamEntries(bytes: Array[Byte], want: String => Boolean,
                            maxBytes: Int): Seq[(String, Array[Byte])] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (want(entry.getName)) {
          val bos = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](8192)
          var r = zin.read(buf)
          while (r >= 0) {
            if (bos.size() + r > maxBytes) bad("part exceeds cap")
            bos.write(buf, 0, r)
            r = zin.read(buf)
          }
          out += ((entry.getName, bos.toByteArray))
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }

  /** Central-directory read (VERDICT r12 #7): locate the EOCD (comment
    * tail ≤ 64 KiB), follow the ZIP64 locator when the classic record
    * carries 0xFFFF/0xFFFFFFFF markers, walk the central headers
    * (ZIP64 extra fields resolve masked sizes/offsets), and read each
    * wanted entry through its local header — sizes come from the
    * CENTRAL record, so STORED entries with data descriptors (general-
    * purpose bit 3, zeroed local sizes) read fine where the streaming
    * walk must refuse. Any structural violation is loud.
    */
  private[graft] def readZipCentral(bytes: Array[Byte], want: String => Boolean,
                                    maxBytes: Int): Seq[(String, Array[Byte])] = {
    val minEocd = 22
    if (bytes.length < minEocd) bad("too short for a zip")
    var e = bytes.length - minEocd
    val stop = math.max(0, bytes.length - minEocd - 65535)
    while (e >= stop && u32(bytes, e) != 0x06054b50L) e -= 1
    if (e < stop || e < 0) bad("no end-of-central-directory")
    var nEntries: Long = u16(bytes, e + 10).toLong
    var cdOff: Long = u32(bytes, e + 16)
    if (nEntries == 0xffffL || cdOff == 0xffffffffL) {
      val loc = e - 20
      if (loc < 0 || u32(bytes, loc) != 0x07064b50L)
        bad("zip64 markers without a zip64 locator")
      val z = u64(bytes, loc + 8)
      if (z < 0 || z > Int.MaxValue || u32(bytes, z.toInt) != 0x06064b50L)
        bad("bad zip64 end-of-central-directory offset")
      nEntries = u64(bytes, z.toInt + 32)
      cdOff = u64(bytes, z.toInt + 48)
    }
    if (nEntries > 65536L) bad(s"absurd zip entry count $nEntries")
    val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    var p = cdOff
    var i = 0L
    while (i < nEntries) {
      if (p > Int.MaxValue) bad("central directory offset overflow")
      val cp = p.toInt
      if (u32(bytes, cp) != 0x02014b50L) bad("bad central-directory header")
      val method = u16(bytes, cp + 10)
      var comp = u32(bytes, cp + 20)
      val nameLen = u16(bytes, cp + 28)
      val extraLen = u16(bytes, cp + 30)
      val cmtLen = u16(bytes, cp + 32)
      var locOff = u32(bytes, cp + 42)
      if (cp + 46 + nameLen > bytes.length) bad("central name beyond file")
      val name = new String(bytes, cp + 46, nameLen, "UTF-8")
      val uncompMasked = u32(bytes, cp + 24) == 0xffffffffL
      if (comp == 0xffffffffL || locOff == 0xffffffffL || uncompMasked) {
        // ZIP64 extra field 0x0001: masked fields appear in the fixed
        // order uncompressed, compressed, local-header offset
        var q = cp + 46 + nameLen
        val qEnd = q + extraLen
        var found = false
        while (q + 4 <= qEnd && !found) {
          val id = u16(bytes, q)
          val sz = u16(bytes, q + 2)
          if (id == 0x0001) {
            var f = q + 4
            if (uncompMasked) f += 8
            if (comp == 0xffffffffL) { comp = u64(bytes, f); f += 8 }
            if (locOff == 0xffffffffL) locOff = u64(bytes, f)
            found = true
          } else q += 4 + sz
        }
        if (!found) bad("masked sizes without a zip64 extra field")
      }
      if (want(name)) {
        if (locOff > Int.MaxValue) bad("local header offset overflow")
        val lo = locOff.toInt
        if (u32(bytes, lo) != 0x04034b50L) bad("bad local header")
        val dataOff = lo + 30 + u16(bytes, lo + 26) + u16(bytes, lo + 28)
        if (comp > maxBytes) bad("part exceeds cap")
        if (dataOff + comp > bytes.length) bad("entry data beyond file")
        val raw = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + comp.toInt)
        val data = method match {
          case 0 => raw
          case 8 =>
            val inf = new java.util.zip.Inflater(true)
            try {
              inf.setInput(raw)
              val bos = new java.io.ByteArrayOutputStream(
                math.min(maxBytes, raw.length * 4))
              val buf = new Array[Byte](8192)
              while (!inf.finished()) {
                val n = inf.inflate(buf)
                if (n == 0 && inf.needsInput()) bad("truncated deflate data")
                if (bos.size() + n > maxBytes) bad("part exceeds cap")
                bos.write(buf, 0, n)
              }
              bos.toByteArray
            } catch {
              case e: java.util.zip.DataFormatException => bad(s"bad deflate: $e")
            } finally inf.end()
          case other => bad(s"unsupported zip method $other")
        }
        out += ((name, data))
      }
      p = cp + 46L + nameLen + extraLen + cmtLen
      i += 1
    }
    out.toSeq
  }

  /** The office extractors' container read: streaming walk first, the
    * central-directory path when the walk REFUSES — real crawl zips
    * carry data-descriptor STORED entries and ZIP64 records the
    * streaming reader cannot handle; genuine corruption still refuses
    * (both paths throw, the extractor maps that to None).
    */
  def zipEntries(bytes: Array[Byte], want: String => Boolean,
                 maxBytes: Int): Seq[(String, Array[Byte])] =
    try streamEntries(bytes, want, maxBytes)
    catch {
      case _: java.util.zip.ZipException => readZipCentral(bytes, want, maxBytes)
    }

  // --------------------------------------------------------- core props
  /** `docProps/core.xml` Dublin Core metadata (VERDICT r12 #8) — the
    * provenance fields a data card wants next to the extracted text.
    * Values stay STRINGS in the document's own form (W3CDTF dates are
    * not reparsed — byte-pinned provenance, no timezone surprises).
    */
  final case class CoreProps(title: Option[String], creator: Option[String],
                             created: Option[String], modified: Option[String])

  private[graft] def parseCoreProps(xml: Array[Byte]): CoreProps = {
    val r = newReader(xml)
    var title, creator, created, modified: Option[String] = None
    var field: String = null
    val cur = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case f @ ("title" | "creator" | "created" | "modified") =>
                field = f; cur.setLength(0)
              case _ => field = null
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (field != null) {
              val v = Some(cur.toString).filter(_.nonEmpty)
              field match {
                case "title"    => title = v
                case "creator"  => creator = v
                case "created"  => created = v
                case "modified" => modified = v
              }
              field = null
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (field != null) cur.append(r.getText)
          case _ => ()
        }
      }
    } finally r.close()
    CoreProps(title, creator, created, modified)
  }

  /** The package's core properties, if `docProps/core.xml` exists; a
    * corrupt container or XML is None (data, not an exception).
    */
  def coreProperties(bytes: Array[Byte]): Option[CoreProps] =
    try {
      zipEntries(bytes, _ == "docProps/core.xml", 1 << 20)
        .headOption.map(e => parseCoreProps(e._2))
    } catch {
      case _: IllegalArgumentException => None
      case _: javax.xml.stream.XMLStreamException => None
      case _: java.io.IOException => None
    }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Closed-form fixture core.xml shared by the office writers: the
    * p138 oracle re-derives every field from (kind, seed).
    */
  private[graft] def fixtureCoreXml(kind: String, seed: Long): String = {
    val frag = md5hex(s"$seed|title").substring(0, 8)
    val day = f"${1 + seed % 28}%02d"
    val day2 = f"${1 + (seed + 3) % 28}%02d"
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
      "<cp:coreProperties xmlns:cp=\"http://schemas.openxmlformats.org/" +
      "package/2006/metadata/core-properties\" " +
      "xmlns:dc=\"http://purl.org/dc/elements/1.1/\" " +
      "xmlns:dcterms=\"http://purl.org/dc/terms/\" " +
      "xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\">" +
      s"<dc:title>$kind $seed $frag</dc:title>" +
      s"<dc:creator>author-${seed % 7}</dc:creator>" +
      "<dcterms:created xsi:type=\"dcterms:W3CDTF\">" +
      s"2025-01-${day}T00:00:00Z</dcterms:created>" +
      "<dcterms:modified xsi:type=\"dcterms:W3CDTF\">" +
      s"2025-01-${day2}T00:00:00Z</dcterms:modified>" +
      "</cp:coreProperties>"
  }

  /** ZIP64 fixture writer: STORED entries with zeroed local sizes +
    * data descriptors (general-purpose bit 3) and a ZIP64 EOCD +
    * locator with 0xFFFF/0xFFFFFFFF markers in the classic record —
    * the container shape `java.util.zip.ZipInputStream` refuses, so
    * the central-directory fallback is load-bearing wherever a fixture
    * class uses this writer.
    */
  def writeZip64(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >>> 32) & 0xffffffffL) }
    val locals = entries.map { case (name, data) =>
      val off = out.size()
      val crc = new java.util.zip.CRC32
      crc.update(data)
      w32(0x04034b50L); w16(45); w16(0x0008); w16(0) // stored + bit 3
      w16(0); w16(0); w32(0L); w32(0L); w32(0L)      // time/date/crc/sizes 0
      val nb = name.getBytes("UTF-8")
      w16(nb.length); w16(0)
      out.write(nb); out.write(data)
      // data descriptor (with signature)
      w32(0x08074b50L); w32(crc.getValue); w32(data.length.toLong); w32(data.length.toLong)
      (name, data, off, crc.getValue)
    }
    val cdOff = out.size()
    locals.foreach { case (name, data, off, crc) =>
      w32(0x02014b50L); w16(45); w16(45); w16(0x0008); w16(0)
      w16(0); w16(0); w32(crc); w32(data.length.toLong); w32(data.length.toLong)
      val nb = name.getBytes("UTF-8")
      w16(nb.length); w16(0); w16(0); w16(0); w16(0)
      w32(0L); w32(off.toLong)
      out.write(nb)
    }
    val cdSize = out.size() - cdOff
    val z64Off = out.size()
    w32(0x06064b50L); w64(44L); w16(45); w16(45); w32(0L); w32(0L)
    w64(locals.size.toLong); w64(locals.size.toLong)
    w64(cdSize.toLong); w64(cdOff.toLong)
    w32(0x07064b50L); w32(0L); w64(z64Off.toLong); w32(1L) // locator
    w32(0x06054b50L); w16(0); w16(0); w16(0xffff); w16(0xffff)
    w32(0xffffffffL); w32(0xffffffffL); w16(0) // classic EOCD, all masked
    out.toByteArray
  }
}
