package graft.ops

/** Legacy PowerPoint 97-2003 `.ppt` text extraction (MS-PPT over
  * [[Cfb]]) — the binary predecessor of [[Pptx]]. The `PowerPoint
  * Document` stream is a RECORD TREE: 8-byte headers
  * (recVer/recInstance u16, recType u16, recLen u32) where recVer 0xF
  * marks a container whose payload is more records. Slide text lives
  * in `SlideListWithText` containers under the Document container:
  * `SlidePersistAtom` marks each slide, `TextBytesAtom` (cp1252) and
  * `TextCharsAtom` (UTF-16LE) carry the text runs.
  *
  * Extraction semantics (deterministic, oracle-able — the [[Pptx]]
  * contract re-expressed over the record tree):
  *  - only `SlideListWithText` with recInstance 0 contributes —
  *    instance 2 is the NOTES list (the same text atom types!) and
  *    must contribute nothing, the p131 notes-exclusion trap in its
  *    binary form;
  *  - slides split at `SlidePersistAtom` boundaries, in stream order;
  *  - each text atom is one block; blocks join with NEWLINE; Word-
  *    style `\r` paragraph marks inside an atom normalize to NEWLINE;
  *  - `TextBytesAtom` decodes through strict cp1252 (undefined bytes
  *    refuse), `TextCharsAtom` as UTF-16LE (odd length refuses).
  *
  * Malformed input is DATA: container violations, a missing document
  * stream, a record overrunning its parent, text before the first
  * persist atom, or an over-deep tree (crafted recursion) → None.
  *
  * Scale note: per-blob CPU inside `mapPartitions` — shuffle-free.
  */
object Ppt {

  private final class PptRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new PptRefused(msg)

  private val RtDocument = 0x03e8
  private val RtSlideListWithText = 0x0ff0
  private val RtSlidePersistAtom = 0x03f3
  private val RtTextBytesAtom = 0x0fa8
  private val RtTextCharsAtom = 0x0fa0

  /** Slide texts in order. None on any violation. */
  def extractText(bytes: Array[Byte]): Option[Vector[String]] = {
    Cfb.read(bytes).flatMap { streams =>
      try {
        val doc = streams.getOrElse("PowerPoint Document",
          bad("no PowerPoint Document stream"))
        val slides = Vector.newBuilder[Vector[String]]
        var cur: scala.collection.mutable.ArrayBuffer[String] = null
        def flush(): Unit = if (cur != null) { slides += cur.toVector }

        def walk(from: Int, to: Int, depth: Int, inSlideList: Boolean): Unit = {
          if (depth > 16) bad("record tree too deep")
          var p = from
          while (p < to) {
            if (p + 8 > to) bad("record header overruns parent")
            val verInst = u16(doc, p)
            val recType = u16(doc, p + 2)
            val len = u32(doc, p + 4)
            if (len < 0 || p + 8 + len > to) bad("record payload overruns parent")
            val isContainer = (verInst & 0x000f) == 0x000f
            val instance = (verInst >> 4) & 0x0fff
            if (isContainer) {
              val childInSlideList =
                recType == RtSlideListWithText && instance == 0
              // notes list (instance 2) and other containers still walk
              // structurally, but only instance-0 slide lists collect
              walk(p + 8, p + 8 + len, depth + 1,
                inSlideList || childInSlideList)
            } else if (inSlideList) {
              recType match {
                case RtSlidePersistAtom =>
                  flush()
                  cur = new scala.collection.mutable.ArrayBuffer[String]
                case RtTextBytesAtom =>
                  if (cur == null) bad("text atom before first persist atom")
                  val sb = new StringBuilder(len)
                  var j = 0
                  while (j < len) {
                    sb.append(cp1252(doc(p + 8 + j) & 0xff)); j += 1
                  }
                  cur += sb.toString.replace('\r', '\n')
                case RtTextCharsAtom =>
                  if (cur == null) bad("text atom before first persist atom")
                  if (len % 2 != 0) bad("odd TextCharsAtom length")
                  cur += new String(doc, p + 8, len,
                    java.nio.charset.StandardCharsets.UTF_16LE)
                    .replace('\r', '\n')
                case _ => ()
              }
            }
            p += 8 + len
          }
        }

        walk(0, doc.length, 0, inSlideList = false)
        flush()
        val out = slides.result()
        if (out.isEmpty) bad("no slides")
        Some(out.map(_.mkString("\n")))
      } catch {
        case _: PptRefused => None
        case _: ArrayIndexOutOfBoundsException => None
      }
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int = {
    val v = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (v > Int.MaxValue) bad("record length overflow")
    v.toInt
  }

  private def cp1252(v: Int): Char =
    try Rtf.cp1252(v)
    catch { case _: RuntimeException => bad(f"byte 0x$v%02x undefined in cp1252") }

  // ---------------------------------------------------------------------------
  // Deterministic fixture
  // ---------------------------------------------------------------------------

  /** Closed-form slide text: a title atom + a two-paragraph body atom
    * (the second paragraph via an in-atom `\r` mark); even (docId+s)
    * plants non-latin1 chars, forcing the UTF-16 atom form.
    */
  def logicalSlide(docId: Long, s: Int): String = {
    val h = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(s"$docId|$s").substring(0, 10)
    val uni = if ((docId + s) % 2 == 0) " é✓" else ""
    s"Slide $s $h\nBody $s$uni\nMore ${docId % 41 + s}"
  }

  def slideCount(docId: Long): Int = 1 + (docId % 3).toInt

  /** A deterministic .ppt: Document container holding an instance-0
    * SlideListWithText (persist atom + title/body text atoms per
    * slide, bytes vs chars by content) and an instance-2 NOTES list
    * whose text must not leak; decoy streams ride the container.
    */
  def syntheticPpt(docId: Long): Array[Byte] = {
    def rec(verInst: Int, recType: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      out(0) = (verInst & 0xff).toByte; out(1) = ((verInst >> 8) & 0xff).toByte
      out(2) = (recType & 0xff).toByte; out(3) = ((recType >> 8) & 0xff).toByte
      val n = payload.length
      out(4) = (n & 0xff).toByte; out(5) = ((n >> 8) & 0xff).toByte
      out(6) = ((n >> 16) & 0xff).toByte; out(7) = ((n >> 24) & 0xff).toByte
      System.arraycopy(payload, 0, out, 8, n)
      out
    }
    def textAtom(s: String): Array[Byte] = {
      val stored = s.replace('\n', '\r')
      if (stored.exists(_ > 0xff))
        rec(0, RtTextCharsAtom,
          stored.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
      else {
        val b = new Array[Byte](stored.length)
        var i = 0
        while (i < stored.length) {
          b(i) = (if (stored(i) == '€') 0x80 else stored(i).toInt).toByte
          i += 1
        }
        rec(0, RtTextBytesAtom, b)
      }
    }

    val ns = slideCount(docId)
    val slideList = (0 until ns).flatMap { s =>
      val h = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"$docId|$s").substring(0, 10)
      val uni = if ((docId + s) % 2 == 0) " é✓" else ""
      rec(0, RtSlidePersistAtom, new Array[Byte](20)) ++
        textAtom(s"Slide $s $h") ++
        textAtom(s"Body $s$uni\nMore ${docId % 41 + s}")
    }.toArray
    val notesList =
      rec(0, RtSlidePersistAtom, new Array[Byte](20)) ++
        textAtom(s"Notes trap $docId must not leak")
    val document = rec(0x000f, RtDocument,
      rec(0x000f, RtSlideListWithText, slideList) ++
        rec(0x002f, RtSlideListWithText, notesList)) // instance 2
    Cfb.write(Seq(
      "PowerPoint Document" -> document,
      "Current User" -> Array[Byte](4, 0, 0, 0),
      "Pictures" -> new Array[Byte](0)))
  }
}
