package graft.ops

/** MPEG-1/2/2.5 Layer III frame-header inventory — the media-cataloging
  * half of MP3 handling. Full sample decode is quantized-DCT float math
  * that can never meet the repo's hash-equality oracle contract (the
  * FLAC/G.711 line), but the FRAME GRAMMAR is pure integer arithmetic:
  * sync walk, header field decode, frame-length stepping. That is
  * exactly what a 100 TB media-catalog pass runs — bitrate/duration/VBR
  * inventory at scan speed, no codec, no samples touched.
  *
  * Grammar implemented (ISO 11172-3 for MPEG-1, ISO 13818-3 for MPEG-2
  * LSF, plus the de-facto MPEG-2.5 extension real podcast/voice corpora
  * are full of — VERDICT r11 #4):
  *  - optional ID3v2 prefix: "ID3" + 2 version bytes + 1 flag byte +
  *    4-byte SYNCSAFE length (7 bits per byte) → skip 10+len;
  *  - frame header: 11-bit sync (0xFFE), version bits `(b1>>3)&3`
  *    (00 = MPEG-2.5, 10 = MPEG-2, 11 = MPEG-1; 01 is RESERVED and
  *    stops the walk), Layer III (01), bitrate index 1..14 (0 =
  *    free-format, 15 = invalid — both stop the walk), samplerate index
  *    0..2, padding bit;
  *  - frame length = spf/8 · bitrate / samplerate + padding, where
  *    samples-per-frame spf is 1152 for MPEG-1 and 576 for MPEG-2/2.5
  *    (so the factor is 144 vs 72) and the bitrate/samplerate TABLES are
  *    version-keyed — decoding an MPEG-2 header with MPEG-1 rows would
  *    mis-size every frame and desync the walk;
  *  - the walk counts COMPLETE frames only (a truncated tail frame is
  *    ignored) and requires a consistent version AND samplerate across
  *    frames (a stream cannot change clock mid-file; a change marks
  *    corruption).
  */
object Mp3 {

  /** kbps by bitrate index (1..14), MPEG-1 Layer III. */
  private[graft] val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** kbps by bitrate index (1..14), MPEG-2/2.5 Layer III (LSF row). */
  private[graft] val BitrateKbpsV2: Array[Int] =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Hz by samplerate index (0..2), per version. */
  private[graft] val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)
  private[graft] val SampleRateHzV2: Array[Int] = Array(22050, 24000, 16000)
  private[graft] val SampleRateHzV25: Array[Int] = Array(11025, 12000, 8000)

  private[graft] val SamplesPerFrame = 1152 // MPEG-1; MPEG-2/2.5 use 576

  /** Version-keyed tables for header version bits `v` ∈ {0, 2, 3}. */
  private def srTable(v: Int): Array[Int] = v match {
    case 3 => SampleRateHz
    case 2 => SampleRateHzV2
    case _ => SampleRateHzV25
  }
  private def brTable(v: Int): Array[Int] =
    if (v == 3) BitrateKbps else BitrateKbpsV2
  private def spf(v: Int): Int = if (v == 3) SamplesPerFrame else 576
  private def versionName(v: Int): String = v match {
    case 3 => "1"
    case 2 => "2"
    case _ => "2.5"
  }

  /** Parsed inventory: complete frames, the MPEG version ("1" / "2" /
    * "2.5"), the (consistent) samplerate, min/max header bitrate in
    * kbps, and the exact integer duration `n·spf·1e6 DIV samplerate` in
    * µs. None when no complete legal frame exists.
    */
  final case class Inventory(nFrames: Int, mpegVersion: String,
                             sampleRateHz: Int,
                             brMinKbps: Int, brMaxKbps: Int,
                             durationUs: Long) {
    def isVbr: Boolean = brMinKbps != brMaxKbps
  }

  private def u(b: Byte): Int = b & 0xff

  /** Length of a leading ID3v2 tag (0 when absent or malformed). */
  private[graft] def id3Length(bytes: Array[Byte]): Int = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return 0
    // syncsafe: 4 × 7 bits, high bit of each byte must be clear
    var i = 6; var len = 0
    while (i < 10) {
      if ((u(bytes(i)) & 0x80) != 0) return 0
      len = (len << 7) | u(bytes(i))
      i += 1
    }
    val total = 10 + len
    if (total <= bytes.length) total else 0
  }

  def parse(bytes: Array[Byte]): Option[Inventory] = {
    if (bytes == null) return None
    var pos = id3Length(bytes)
    var n = 0; var ver = -1; var sr = -1
    var brMin = Int.MaxValue; var brMax = 0
    var done = false
    while (!done && pos + 4 <= bytes.length) {
      val b0 = u(bytes(pos)); val b1 = u(bytes(pos + 1))
      val b2 = u(bytes(pos + 2))
      // 11-bit sync (b1 bits 7-5 = 111) + Layer III (bits 2-1 = 01);
      // version bits 4-3 select the table set — 01 is RESERVED and
      // refuses (a looser check would misdecode it with some table and
      // desync the walk; refusal keeps corruption loud)
      val v = (b1 >> 3) & 0x3
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0 || ((b1 >> 1) & 0x3) != 1 ||
        v == 1) done = true
      else {
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) done = true
        else if (ver != -1 && v != ver) done = true // mid-stream version change
        else {
          val rate = srTable(v)(srIdx)
          if (sr != -1 && rate != sr) done = true // mid-stream clock change
          else {
            val kbps = brTable(v)(brIdx)
            val size = (spf(v) / 8) * (kbps * 1000) / rate + padding
            if (pos + size > bytes.length) done = true // truncated tail
            else {
              ver = v; sr = rate; n += 1
              brMin = math.min(brMin, kbps)
              brMax = math.max(brMax, kbps)
              pos += size
            }
          }
        }
      }
    }
    if (n == 0) None
    else Some(Inventory(n, versionName(ver), sr, brMin, brMax,
      n.toLong * spf(ver) * 1000000L / sr))
  }

  /** Deterministic fixture: `3 + seed%4` frames at samplerate index
    * `seed%3`, frame i at bitrate index `1 + (seed+i)%14` with padding
    * `(seed+i)%2`; even seeds carry a 10+10-byte ID3v2 prefix. MPEG
    * version by `seed % 7`: 5 → MPEG-2 (22.05/24/16 kHz LSF rows), 6 →
    * MPEG-2.5 (11.025/12/8 kHz), else MPEG-1 — so the version-keyed
    * tables are load-bearing on every seventh document. The payload past
    * each header is a seed-derived byte fill, so frame stepping must be
    * exact to find every subsequent sync.
    */
  def syntheticMp3(seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (seed % 2 == 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10))
      var i = 0
      while (i < 10) { out.write((seed + i).toInt & 0x7f); i += 1 }
    }
    val v = (seed % 7) match {
      case 5 => 2 // MPEG-2
      case 6 => 0 // MPEG-2.5
      case _ => 3 // MPEG-1
    }
    val b1 = 0xe0 | (v << 3) | (1 << 1) | 0x1 // sync|version|Layer III|no CRC
    val srIdx = (seed % 3).toInt
    val rate = srTable(v)(srIdx)
    val nFrames = 3 + (seed % 4).toInt
    var f = 0
    while (f < nFrames) {
      val brIdx = 1 + ((seed + f) % 14).toInt
      val padding = ((seed + f) % 2).toInt
      val size = (spf(v) / 8) * (brTable(v)(brIdx) * 1000) / rate + padding
      out.write(0xff)
      out.write(b1)
      out.write((brIdx << 4) | (srIdx << 2) | (padding << 1))
      out.write(0xc0) // mono
      var i = 4
      while (i < size) { out.write((seed + f + i).toInt & 0xff); i += 1 }
      f += 1
    }
    out.toByteArray
  }
}
