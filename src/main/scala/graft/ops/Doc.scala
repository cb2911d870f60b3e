package graft.ops

/** Legacy Word 97-2003 `.doc` text extraction (MS-DOC over [[Cfb]]) —
  * the binary predecessor of DOCX and still a large share of real
  * crawl and mail-attachment corpora. The text is NOT a byte run: it
  * lives behind the FIB → CLX → piece-table indirection, each piece
  * independently 8-bit (cp1252) or UTF-16LE, with Word's control
  * characters inline. A naive "strings" pass yields interleaved
  * garbage; skipping the piece table misses every document edited
  * non-linearly (Word appends pieces on edit instead of rewriting).
  *
  * Extraction semantics (deterministic, oracle-able):
  *  - FIB sanity: wIdent 0xA5EC; `fWhichTblStm` (FIB flag bit 0x0200)
  *    selects the `1Table`/`0Table` stream — honoring the bit is
  *    load-bearing, both appear in the wild;
  *  - CLX at fcClx/lcbClx in the table stream: leading Prc blocks
  *    (clxt=1, property modifiers) are SKIPPED structurally, the Pcdt
  *    (clxt=2) holds the PlcPcd piece table — n+1 CPs then n PCDs;
  *  - each PCD's fc carries the compression bit (0x40000000): set →
  *    cp1252 bytes at fc/2 (one byte per char), clear → UTF-16LE at
  *    fc; both decode strictly (undefined cp1252 bytes refuse);
  *  - Word control characters: 0x0D ends a paragraph, 0x0B is an
  *    in-paragraph line break, 0x07 a cell/row mark (emitted as TAB),
  *    0x13/0x14/0x15 delimit fields — the INSTRUCTION between 0x13
  *    and 0x14 (e.g. `HYPERLINK http://...`) is dropped, the cached
  *    RESULT between 0x14 and 0x15 is kept (nesting supported) — the
  *    classic naive-reader bug emits raw field codes into the corpus;
  *    any other C0 control refuses (refusal beats mojibake).
  *
  * Malformed input is DATA: container violations ([[Cfb]]), a missing
  * WordDocument/table stream, a bad FIB, an unterminated field, or a
  * piece pointing outside the stream → None.
  *
  * Scale note: per-blob CPU work inside `mapPartitions` — shuffle-free,
  * like the PDF/DOCX/RTF paths.
  */
object Doc {

  private final class DocRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new DocRefused(msg)

  /** Paragraphs of the document, in order. None on any violation. */
  def extractText(bytes: Array[Byte]): Option[Vector[String]] = {
    Cfb.read(bytes).flatMap { streams =>
      try {
        val word = streams.getOrElse("WordDocument", bad("no WordDocument"))
        if (word.length < 0x200) bad("WordDocument too short for FIB")
        if (u16(word, 0) != 0xa5ec) bad("bad wIdent")
        val flags = u16(word, 0x0a)
        val tableName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
        val table = streams.getOrElse(tableName, bad(s"no $tableName"))
        val fcClx = s32(word, 0x01a2)
        val lcbClx = s32(word, 0x01a6)
        if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > table.length)
          bad("CLX outside table stream")
        Some(paragraphs(decodePieces(word, table, fcClx, lcbClx)))
      } catch {
        case _: DocRefused => None
        case _: ArrayIndexOutOfBoundsException => None
      }
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def s32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** CLX walk → concatenated piece text (raw, control chars intact). */
  private def decodePieces(word: Array[Byte], table: Array[Byte],
                           fcClx: Int, lcbClx: Int): String = {
    var p = fcClx
    val end = fcClx + lcbClx
    // skip Prc blocks (clxt=1): 1 + 2-byte cbGrpprl + data
    while (p < end && table(p) == 1) {
      val cb = u16(table, p + 1)
      p += 3 + cb
      if (p > end) bad("Prc overruns CLX")
    }
    if (p >= end || table(p) != 2) bad("no Pcdt in CLX")
    val lcb = s32(table, p + 1)
    p += 5
    if (lcb < 4 + 12 || p + lcb > end) bad("bad PlcPcd size")
    if ((lcb - 4) % 12 != 0) bad("PlcPcd not (n+1)*4 + n*8")
    val n = (lcb - 4) / 12
    val cps = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { cps(i) = s32(table, p + 4 * i); i += 1 }
    val pcdBase = p + 4 * (n + 1)
    val sb = new StringBuilder
    i = 0
    while (i < n) {
      val nChars = cps(i + 1) - cps(i)
      if (nChars <= 0) bad("non-increasing piece CPs")
      val fcRaw = s32(table, pcdBase + 8 * i + 2)
      val compressed = (fcRaw & 0x40000000) != 0
      val fc = fcRaw & 0x3fffffff
      if (compressed) {
        val off = fc / 2
        if (off + nChars > word.length) bad("compressed piece outside stream")
        var j = 0
        while (j < nChars) { sb.append(cp1252(word(off + j) & 0xff)); j += 1 }
      } else {
        if (fc + 2 * nChars > word.length) bad("unicode piece outside stream")
        sb.append(new String(word, fc, 2 * nChars,
          java.nio.charset.StandardCharsets.UTF_16LE))
      }
      i += 1
    }
    sb.toString
  }

  /** cp1252 byte → char through the shared strict table ([[Rtf]]'s). */
  private def cp1252(v: Int): Char =
    try Rtf.cp1252(v)
    catch { case _: RuntimeException => bad(f"byte 0x$v%02x undefined in cp1252") }

  /** Control-character processing + paragraph split. */
  private def paragraphs(raw: String): Vector[String] = {
    val paras = Vector.newBuilder[String]
    val sb = new StringBuilder
    var fieldInstr = 0 // depth of field-instruction regions being skipped
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      c match {
        case '\u0013' => fieldInstr += 1 // field begin: skip instruction
        case '\u0014' =>
          if (fieldInstr == 0) bad("field separator outside field")
          fieldInstr -= 1 // instruction done; result region is kept
        case '\u0015' => () // field end mark
        case '\r' =>
          if (fieldInstr == 0) { paras += sb.toString; sb.setLength(0) }
        case '\u000b' => if (fieldInstr == 0) sb.append('\n')
        case '\u0007' => if (fieldInstr == 0) sb.append('\t')
        case '\t' => if (fieldInstr == 0) sb.append('\t')
        case o if o < 0x20 => bad(f"unexpected control char 0x${o.toInt}%02x")
        case o => if (fieldInstr == 0) sb.append(o)
      }
      i += 1
    }
    if (fieldInstr > 0) bad("unterminated field instruction")
    if (sb.nonEmpty) paras += sb.toString
    paras.result()
  }

  // ---------------------------------------------------------------------------
  // Deterministic fixture
  // ---------------------------------------------------------------------------

  /** Logical paragraph text — the closed form both the Scala fixture
    * and the DuckDB oracle compute.
    */
  def logicalPara(docId: Long, i: Int): String = {
    val np = paraCount(docId)
    val base = s"Doc $i " +
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$docId|$i").substring(0, 12)
    val b = new StringBuilder(base)
    if (i % 3 == 0) b.append('\t').append("tab")
    if (i % 4 == 1) b.append(' ').append('é').append('€')
    if (i % 5 == 2) b.append('\n').append("wrapped")
    if (i % 7 == 3) b.append("linked")
    if (docId % 2 == 0 && i == np - 1) b.append(' ').append('✓')
    b.toString
  }

  def paraCount(docId: Long): Int = 2 + (docId % 3).toInt

  /** The stored (in-file) character stream: logical text with Word's
    * control characters put back — 0x0D paragraph marks, 0x0B line
    * breaks, and for the `linked` cadence a full field construct
    * (0x13 instruction 0x14 result 0x15).
    */
  private def storedText(docId: Long): String = {
    val np = paraCount(docId)
    val sb = new StringBuilder
    var i = 0
    while (i < np) {
      val base = s"Doc $i " +
        org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$docId|$i").substring(0, 12)
      sb.append(base)
      if (i % 3 == 0) sb.append('\t').append("tab")
      if (i % 4 == 1) sb.append(' ').append('é').append('€')
      if (i % 5 == 2) sb.append('\u000b').append("wrapped")
      if (i % 7 == 3) sb.append('\u0013')
        .append("HYPERLINK http://trap.example/must-not-leak")
        .append('\u0014').append("linked").append('\u0015')
      if (docId % 2 == 0 && i == np - 1) sb.append(' ').append('✓')
      sb.append('\r')
      i += 1
    }
    sb.toString
  }

  /** A deterministic .doc: CFB container with WordDocument + the
    * FIB-selected table stream (0Table/1Table alternating). The text
    * splits into TWO pieces — the first always compressed cp1252, the
    * second UTF-16LE for even docIds (which also carry a '✓' no 8-bit
    * piece could hold) and cp1252 for odd — stored OUT OF ORDER in the
    * file (second piece's bytes first) so offset-following is proven.
    * The CLX opens with a Prc block the parser must skip, and a decoy
    * stream rides the container.
    */
  def syntheticDoc(docId: Long): Array[Byte] = {
    val text = storedText(docId)
    val split = 9 // piece boundary, inside the first paragraph's ASCII
    val piece0 = text.substring(0, split)
    val piece1 = text.substring(split)
    val uni = docId % 2 == 0

    val fibLen = 0x0200
    val body = new java.io.ByteArrayOutputStream()
    // piece 1's bytes FIRST (out of file order)
    val p1Off = fibLen
    if (uni) {
      body.write(piece1.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    } else {
      piece1.foreach { c => body.write(cp1252Byte(c)) }
    }
    val p0Off = fibLen + body.size()
    piece0.foreach { c => body.write(cp1252Byte(c)) }

    // every fifth doc pads WordDocument past the 4096 mini-stream
    // cutoff, so BOTH the mini-FAT and regular-FAT read paths stay
    // exercised by the fixture family (slack bytes are dead space the
    // piece table never references — normal in real files)
    val slack =
      if (docId % 5 == 0) math.max(0, 4608 - (fibLen + body.size())) else 0
    val word = new Array[Byte](fibLen + body.size() + slack)
    wu16(word, 0, 0xa5ec)
    wu16(word, 2, 0x00c1) // nFib: Word 97
    val oneTable = docId % 3 == 0
    wu16(word, 0x0a, if (oneTable) 0x0200 else 0x0000)
    System.arraycopy(body.toByteArray, 0, word, fibLen, body.size())

    // table stream: decoy Prc block + Pcdt with the two pieces
    val prcData = Array[Byte](0x08, 0x00) // fake sprm, structurally skipped
    val tbl = new java.io.ByteArrayOutputStream()
    val clxStart = 16 // CLX not at offset 0: fcClx is honored, not assumed
    tbl.write(new Array[Byte](clxStart))
    tbl.write(1) // Prc
    tbl.write(prcData.length & 0xff); tbl.write(0)
    tbl.write(prcData)
    tbl.write(2) // Pcdt
    val n = 2
    val lcb = 4 * (n + 1) + 8 * n
    writeU32(tbl, lcb)
    writeU32(tbl, 0)
    writeU32(tbl, split)
    writeU32(tbl, text.length)
    // PCD 0: compressed, fc = 2 * byte offset
    writeU16(tbl, 0); writeU32(tbl, (p0Off * 2) | 0x40000000); writeU16(tbl, 0)
    // PCD 1: per-parity encoding
    writeU16(tbl, 0)
    writeU32(tbl, if (uni) p1Off else (p1Off * 2) | 0x40000000)
    writeU16(tbl, 0)
    val tableBytes = tbl.toByteArray
    wu32(word, 0x01a2, clxStart)
    wu32(word, 0x01a6, tableBytes.length - clxStart)

    Cfb.write(Seq(
      "WordDocument" -> word,
      (if (oneTable) "1Table" else "0Table") -> tableBytes,
      "CompObj" -> Array[Byte](1, 0, 0, 0), // decoy metadata stream
      "Data" -> new Array[Byte](0)))
  }

  private def cp1252Byte(c: Char): Int = c match {
    case '€' => 0x80
    case o if o <= 0xff => o.toInt
    case o => throw new IllegalArgumentException(f"not cp1252-encodable: $o%04x")
  }

  private def wu16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def wu32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private def writeU16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def writeU32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
}
