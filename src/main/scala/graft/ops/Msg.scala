package graft.ops

/** Outlook `.msg` extraction (MS-OXMSG over [[Cfb]]) — the mail-archive
  * sibling of [[Eml]]: exported/forwarded messages and mail-server
  * dumps arrive as OLE2 containers whose MAPI properties live in
  * per-property STREAMS named `__substg1.0_TTTTSSSS` (TTTT = property
  * tag, SSSS = type). The text triple a pipeline needs:
  *
  *  - `0037` subject, `0C1F` sender SMTP address, `1000` body;
  *  - type `001F` is UTF-16LE, type `001E` an 8-bit windows-1252
  *    string — BOTH occur in the wild (Unicode vs ANSI stores), so the
  *    reader resolves whichever is present (both present → the Unicode
  *    stream wins, matching Outlook's own preference);
  *  - CRLF line ends normalize to `\n`;
  *  - the fixed-width `__properties_version1.0` stream and named-
  *    property streams are structural metadata, not text — ignored.
  *
  * Malformed input is DATA, refusal beats mojibake: a missing subject
  * or body property, an odd-length UTF-16 stream, or an undefined
  * cp1252 byte → None.
  *
  * Scale note: per-blob CPU inside `mapPartitions` — shuffle-free.
  */
object Msg {

  final case class MsgMail(subject: String, fromAddr: String, body: String)

  private final class MsgRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new MsgRefused(msg)

  /** Subject, sender and body of a .msg. None on any violation. */
  def extractMail(bytes: Array[Byte]): Option[MsgMail] = {
    Cfb.read(bytes).flatMap { streams =>
      try {
        def prop(tag: String, required: Boolean): String = {
          val uni = streams.get(s"__substg1.0_${tag}001F")
          val ansi = streams.get(s"__substg1.0_${tag}001E")
          (uni, ansi) match {
            case (Some(b), _) =>
              if (b.length % 2 != 0) bad(s"odd UTF-16 length for $tag")
              new String(b, java.nio.charset.StandardCharsets.UTF_16LE)
            case (None, Some(b)) =>
              val sb = new StringBuilder(b.length)
              var i = 0
              while (i < b.length) { sb.append(cp1252(b(i) & 0xff)); i += 1 }
              sb.toString
            case (None, None) =>
              if (required) bad(s"missing property $tag") else ""
          }
        }
        val subject = prop("0037", required = true)
        val from = prop("0C1F", required = false)
        val body = prop("1000", required = true).replace("\r\n", "\n")
        Some(MsgMail(subject, from, body))
      } catch {
        case _: MsgRefused => None
      }
    }
  }

  private def cp1252(v: Int): Char =
    try Rtf.cp1252(v)
    catch { case _: RuntimeException => bad(f"byte 0x$v%02x undefined in cp1252") }

  // ---------------------------------------------------------------------------
  // Deterministic fixture
  // ---------------------------------------------------------------------------

  def logicalSubject(docId: Long): String =
    s"Msg $docId " + (if (docId % 2 == 0) "é✓" else "é€")

  def logicalFrom(docId: Long): String = s"sender${docId % 7}@example.com"

  def logicalBody(docId: Long): String = {
    val h = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(docId.toString).substring(0, 12)
    s"Body $h\nLine ${docId % 13}"
  }

  /** A deterministic .msg: even docIds store Unicode (001F) property
    * streams, odd ones ANSI (001E) — both reader legs stay
    * load-bearing; the body carries CRLF line ends; decoy metadata
    * streams (`__properties_version1.0`, a binary named property)
    * ride the container and must contribute nothing.
    */
  def syntheticMsg(docId: Long): Array[Byte] = {
    val uni = docId % 2 == 0
    def enc(s: String): Array[Byte] =
      if (uni) s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else {
        val out = new Array[Byte](s.length)
        var i = 0
        while (i < s.length) {
          out(i) = (if (s(i) == '€') 0x80 else s(i).toInt).toByte; i += 1
        }
        out
      }
    val t = if (uni) "001F" else "001E"
    Cfb.write(Seq(
      s"__substg1.0_0037$t" -> enc(logicalSubject(docId)),
      s"__substg1.0_0C1F$t" -> enc(logicalFrom(docId)),
      s"__substg1.0_1000$t" -> enc(logicalBody(docId).replace("\n", "\r\n")),
      "__substg1.0_3701000D" -> Array[Byte](0, 1, 2, 3), // binary decoy
      "__properties_version1.0" -> new Array[Byte](96)))
  }
}
