package graft.ops

/** Legacy Excel 97-2003 `.xls` cell-text extraction (BIFF8 over
  * [[Cfb]]) — the binary predecessor of [[Xlsx]] and still common in
  * crawled spreadsheets and mail attachments. The text layer is a
  * RECORD STREAM, not XML: the `Workbook` stream is a sequence of
  * [id u16][len u16][payload] records — a globals substream holding
  * the Shared String Table and per-sheet BOF pointers, then one
  * substream per sheet holding the cell records.
  *
  * Extraction semantics (deterministic, oracle-able — the [[Xlsx]]
  * contract re-expressed over BIFF):
  *  - `BoundSheet8` records (0x0085) give the sheet ORDER and each
  *    sheet substream's byte position — sheets extract in boundsheet
  *    order, not record order;
  *  - string cells are `LabelSst` (0x00FD) indexes into the DEDUPLICATED
  *    `SST` (0x00FC) — the same indirection xl/sharedStrings.xml plays
  *    in OOXML, and the same corpus-wide misalignment risk: a dangling
  *    isst REFUSES;
  *  - SST entries are XLUnicodeRichExtendedString: per-string
  *    fHighByte flag selects compressed (latin-1 bytes) or UTF-16LE —
  *    BOTH appear in real files and the fixture;
  *  - numeric cells are `Number` (0x0203) IEEE doubles; integral
  *    values render without a decimal point (the fixture stays
  *    integral — a non-integral double has no cross-engine exact
  *    string form, so it refuses rather than guessing a format);
  *  - each sheet renders rows in (row, col) order, cells joined by
  *    TAB, rows by NEWLINE — byte-compatible with [[Xlsx]] output.
  *
  * Malformed input is DATA: container violations, a missing Workbook
  * stream, a record overrunning the stream, a dangling SST index, or
  * a non-integral number → None.
  *
  * Scale note: per-blob CPU inside `mapPartitions` — shuffle-free.
  */
object Xls {

  private final class XlsRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new XlsRefused(msg)

  private val RecBof = 0x0809
  private val RecEof = 0x000a
  private val RecSst = 0x00fc
  private val RecBoundSheet = 0x0085
  private val RecLabelSst = 0x00fd
  private val RecNumber = 0x0203

  /** Sheet texts (tab/newline grids) in boundsheet order. None on any
    * violation.
    */
  def extractText(bytes: Array[Byte]): Option[Vector[String]] = {
    Cfb.read(bytes).flatMap { streams =>
      try {
        val wb = streams.getOrElse("Workbook", bad("no Workbook stream"))
        val (sst, sheets) = globals(wb)
        if (sheets.isEmpty) bad("no sheets")
        Some(sheets.map { case (_, pos) => sheetText(wb, pos, sst) })
      } catch {
        case _: XlsRefused => None
        case _: ArrayIndexOutOfBoundsException => None
      }
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Globals substream: SST + boundsheets (name, substream position). */
  private def globals(wb: Array[Byte]): (Vector[String], Vector[(String, Int)]) = {
    if (wb.length < 4 || u16(wb, 0) != RecBof) bad("Workbook does not open with BOF")
    var sst = Vector.empty[String]
    val sheets = Vector.newBuilder[(String, Int)]
    var p = 0
    var done = false
    while (!done) {
      if (p + 4 > wb.length) bad("record header overruns stream")
      val id = u16(wb, p)
      val len = u16(wb, p + 2)
      if (p + 4 + len > wb.length) bad("record payload overruns stream")
      id match {
        case RecEof => done = true
        case RecSst =>
          val total = u32(wb, p + 4).toInt
          val unique = u32(wb, p + 8).toInt
          if (unique < 0 || total < unique) bad("bad SST counts")
          var q = p + 12
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < unique) {
            val (s, q2) = readBiffString(wb, q, p + 4 + len)
            out += s; q = q2; i += 1
          }
          sst = out.result()
        case RecBoundSheet =>
          val lbPly = u32(wb, p + 4).toInt
          // sheet name: ShortXLUnicodeString (cch u8 + flags u8)
          val cch = wb(p + 10) & 0xff
          val high = (wb(p + 11) & 0x01) != 0
          val name =
            if (high) new String(wb, p + 12, 2 * cch,
              java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(wb, p + 12, cch,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          sheets += name -> lbPly
        case _ => ()
      }
      p += 4 + len
    }
    (sst, sheets.result())
  }

  /** XLUnicodeRichExtendedString at `q` (must not cross `limit`):
    * cch u16, flags u8 (0x01 fHighByte; rich/ext flags refuse — the
    * fixture never writes them and partial support would silently drop
    * formatting runs' text offsets).
    */
  private def readBiffString(b: Array[Byte], q: Int, limit: Int): (String, Int) = {
    if (q + 3 > limit) bad("SST string header overruns record")
    val cch = u16(b, q)
    val flags = b(q + 2) & 0xff
    if ((flags & 0x0c) != 0) bad("rich/phonetic SST strings unsupported")
    val high = (flags & 0x01) != 0
    val nBytes = if (high) 2 * cch else cch
    if (q + 3 + nBytes > limit) bad("SST string body overruns record")
    val s =
      if (high) new String(b, q + 3, nBytes,
        java.nio.charset.StandardCharsets.UTF_16LE)
      else new String(b, q + 3, nBytes,
        java.nio.charset.StandardCharsets.ISO_8859_1)
    (s, q + 3 + nBytes)
  }

  /** One sheet substream → the tab/newline cell grid. */
  private def sheetText(wb: Array[Byte], start: Int, sst: Vector[String]): String = {
    if (start < 0 || start + 4 > wb.length) bad("sheet position outside stream")
    if (u16(wb, start) != RecBof) bad("sheet substream does not open with BOF")
    val cells = scala.collection.mutable.TreeMap.empty[(Int, Int), String]
    var p = start
    var done = false
    while (!done) {
      if (p + 4 > wb.length) bad("record header overruns stream")
      val id = u16(wb, p)
      val len = u16(wb, p + 2)
      if (p + 4 + len > wb.length) bad("record payload overruns stream")
      id match {
        case RecEof => done = true
        case RecLabelSst =>
          val row = u16(wb, p + 4)
          val col = u16(wb, p + 6)
          val isst = u32(wb, p + 10).toInt
          if (isst < 0 || isst >= sst.length)
            bad(s"dangling SST index $isst of ${sst.length}")
          cells((row, col)) = sst(isst)
        case RecNumber =>
          val row = u16(wb, p + 4)
          val col = u16(wb, p + 6)
          val v = java.lang.Double.longBitsToDouble(
            u32(wb, p + 10) | (u32(wb, p + 14) << 32))
          if (v != Math.floor(v) || v.isInfinite || Math.abs(v) > 1e15)
            bad(s"non-integral number $v has no exact text form")
          cells((row, col)) = v.toLong.toString
        case _ => ()
      }
      p += 4 + len
    }
    // (row, col)-ordered grid, rows joined by \n, cells by \t
    cells.toVector
      .groupBy(_._1._1).toVector.sortBy(_._1)
      .map { case (_, rowCells) => rowCells.map(_._2).mkString("\t") }
      .mkString("\n")
  }

  // ---------------------------------------------------------------------------
  // Deterministic fixture
  // ---------------------------------------------------------------------------

  /** Closed-form cell text: sheet s has 2 rows × 2 cols; string cells
    * index the shared table (with REUSE — cell (1,0) of every sheet
    * repeats the workbook-constant header string), numbers are
    * integral. Mirrors the [[Xlsx]] fixture's shape so the two
    * engines' outputs stay comparable.
    */
  def logicalSheet(docId: Long, s: Int): String = {
    val h = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"$docId|$s").substring(0, 10)
    val uni = if ((docId + s) % 2 == 0) " é✓" else ""
    s"Cell $s $h$uni\t${docId % 97 + s}\nTotal\t${(docId % 89) * (s + 1)}"
  }

  def sheetCount(docId: Long): Int = 1 + (docId % 3).toInt

  /** A deterministic .xls: globals (SST with per-string compressed vs
    * UTF-16 encoding and a REUSED entry, boundsheets) + one substream
    * per sheet holding LabelSst and Number cells in SHUFFLED record
    * order (the reader must assemble (row, col) order itself).
    */
  def syntheticXls(docId: Long): Array[Byte] = {
    val ns = sheetCount(docId)
    // shared strings: per-sheet cell string + the reused "Total"
    val strings = (0 until ns).map { s =>
      val h = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$docId|$s").substring(0, 10)
      val uni = if ((docId + s) % 2 == 0) " é✓" else ""
      s"Cell $s $h$uni"
    }.toVector :+ "Total"
    val totalIdx = strings.length - 1

    def rec(id: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](4 + payload.length)
      out(0) = (id & 0xff).toByte; out(1) = ((id >> 8) & 0xff).toByte
      out(2) = (payload.length & 0xff).toByte
      out(3) = ((payload.length >> 8) & 0xff).toByte
      System.arraycopy(payload, 0, out, 4, payload.length)
      out
    }
    def u16b(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32b(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    def biffString(s: String): Array[Byte] = {
      val high = s.exists(_ > 0xff)
      val body =
        if (high) s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
        else s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      u16b(s.length) ++ Array((if (high) 1 else 0).toByte) ++ body
    }

    val bof = rec(RecBof, u16b(0x0600) ++ u16b(0x0005) ++
      new Array[Byte](12)) // BIFF8, workbook globals
    val sheetBof = rec(RecBof, u16b(0x0600) ++ u16b(0x0010) ++
      new Array[Byte](12)) // worksheet substream

    val sstPayload = u32b((ns * 2 + ns).toLong) ++ u32b(strings.length.toLong) ++
      strings.flatMap(biffString).toArray
    val sst = rec(RecSst, sstPayload)

    // sheet substreams (built first so boundsheet offsets are known)
    def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
      rec(RecLabelSst, u16b(row) ++ u16b(col) ++ u16b(0) ++ u32b(isst.toLong))
    def number(row: Int, col: Int, v: Long): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v.toDouble)
      rec(RecNumber, u16b(row) ++ u16b(col) ++ u16b(0) ++
        u32b(bits & 0xffffffffL) ++ u32b(bits >>> 32))
    }
    val sheetStreams = (0 until ns).map { s =>
      // records in SHUFFLED order: (1,1), (0,0), (1,0), (0,1)
      sheetBof ++
        number(1, 1, (docId % 89) * (s + 1)) ++
        labelSst(0, 0, s) ++
        labelSst(1, 0, totalIdx) ++
        number(0, 1, docId % 97 + s) ++
        rec(RecEof, new Array[Byte](0))
    }

    def boundSheet(name: String, lbPly: Int): Array[Byte] = {
      val nm = name.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      rec(RecBoundSheet, u32b(lbPly.toLong) ++ u16b(0) ++
        Array(nm.length.toByte, 0.toByte) ++ nm)
    }
    // globals size depends on boundsheet record sizes (names fixed-width)
    val names = (0 until ns).map(s => f"Sheet$s%02d")
    val bsLen = names.map(n => 4 + 4 + 2 + 2 + n.length).sum
    val globalsLen = bof.length + sst.length + bsLen + 4 // + EOF
    val offsets = sheetStreams.scanLeft(globalsLen)(_ + _.length)
    val globalsBytes = bof ++ sst ++
      names.zipWithIndex.flatMap { case (n, i) => boundSheet(n, offsets(i)) } ++
      rec(RecEof, new Array[Byte](0))
    require(globalsBytes.length == globalsLen,
      s"globals size drift: ${globalsBytes.length} vs $globalsLen")

    val workbook = globalsBytes ++ sheetStreams.flatten
    Cfb.write(Seq(
      "Workbook" -> workbook,
      "CompObj" -> Array[Byte](2, 0, 0, 0)))
  }
}
