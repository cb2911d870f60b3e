package graft.ops

/** MPEG-1 Layer III frame-header inventory — the media-cataloging half of
  * MP3 handling. Full sample decode is quantized-DCT float math that can
  * never meet the repo's hash-equality oracle contract (the FLAC/G.711
  * line), but the FRAME GRAMMAR is pure integer arithmetic: sync walk,
  * header field decode, frame-length stepping. That is exactly what a
  * 100 TB media-catalog pass runs — bitrate/duration/VBR inventory at
  * scan speed, no codec, no samples touched.
  *
  * Grammar implemented (ISO 11172-3):
  *  - optional ID3v2 prefix: "ID3" + 2 version bytes + 1 flag byte +
  *    4-byte SYNCSAFE length (7 bits per byte) → skip 10+len;
  *  - frame header: 11-bit sync (0xFFE), MPEG-1 (bits 11), Layer III
  *    (01), bitrate index 1..14 (0 = free-format, 15 = invalid — both
  *    stop the walk), samplerate index 0..2, padding bit;
  *  - frame length = 144 · bitrate / samplerate + padding (exact integer
  *    for every legal MPEG-1 L3 combination);
  *  - the walk counts COMPLETE frames only (a truncated tail frame is
  *    ignored) and requires a consistent samplerate across frames (MP3
  *    streams cannot change clock mid-file; a change marks corruption).
  */
object Mp3 {

  /** kbps by bitrate index for MPEG-1 Layer III (1..14). */
  private[graft] val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Hz by samplerate index for MPEG-1 (0..2). */
  private[graft] val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  private[graft] val SamplesPerFrame = 1152

  /** Parsed inventory: complete frames, the (consistent) samplerate,
    * min/max header bitrate in kbps, and the exact integer duration
    * `n·1152·1e6 DIV samplerate` in µs. None when no complete legal
    * frame exists.
    */
  final case class Inventory(nFrames: Int, sampleRateHz: Int,
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
    var n = 0; var sr = -1; var brMin = Int.MaxValue; var brMax = 0
    var done = false
    while (!done && pos + 4 <= bytes.length) {
      val b0 = u(bytes(pos)); val b1 = u(bytes(pos + 1))
      val b2 = u(bytes(pos + 2))
      // 11-bit sync + MPEG-1 (b1 bits 4-3 = 11) + Layer III (bits 2-1 =
      // 01): mask 0xfe pins ALL of sync/version/layer, leaving only the
      // protection bit free — a looser mask (0xf6) would let MPEG-2
      // headers (version bits 10, b1 = 0xf2/0xf3) through and misdecode
      // them with MPEG-1 tables (wrong 144-factor frame size, wrong
      // samplerate row), desyncing the walk on real MPEG-2 files.
      if (b0 != 0xff || (b1 & 0xfe) != 0xfa) done = true
      else {
        val brIdx = (b2 >> 4) & 0xf
        val srIdx = (b2 >> 2) & 0x3
        val padding = (b2 >> 1) & 0x1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) done = true
        else {
          val rate = SampleRateHz(srIdx)
          if (sr != -1 && rate != sr) done = true // mid-stream clock change
          else {
            val size = 144 * (BitrateKbps(brIdx) * 1000) / rate + padding
            if (pos + size > bytes.length) done = true // truncated tail
            else {
              sr = rate; n += 1
              brMin = math.min(brMin, BitrateKbps(brIdx))
              brMax = math.max(brMax, BitrateKbps(brIdx))
              pos += size
            }
          }
        }
      }
    }
    if (n == 0) None
    else Some(Inventory(n, sr, brMin, brMax,
      n.toLong * SamplesPerFrame * 1000000L / sr))
  }

  /** Deterministic fixture: `3 + seed%4` frames at samplerate index
    * `seed%3`, frame i at bitrate index `1 + (seed+i)%14` with padding
    * `(seed+i)%2`; even seeds carry a 10+10-byte ID3v2 prefix. The
    * payload past each header is a seed-derived byte fill, so frame
    * stepping must be exact to find every subsequent sync.
    */
  def syntheticMp3(seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (seed % 2 == 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10))
      var i = 0
      while (i < 10) { out.write((seed + i).toInt & 0x7f); i += 1 }
    }
    val srIdx = (seed % 3).toInt
    val nFrames = 3 + (seed % 4).toInt
    var f = 0
    while (f < nFrames) {
      val brIdx = 1 + ((seed + f) % 14).toInt
      val padding = ((seed + f) % 2).toInt
      val size = 144 * (BitrateKbps(brIdx) * 1000) / SampleRateHz(srIdx) + padding
      out.write(0xff)
      out.write(0xfa | 0x01) // MPEG-1, Layer III, no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (padding << 1))
      out.write(0xc0) // mono
      var i = 4
      while (i < size) { out.write((seed + f + i).toInt & 0xff); i += 1 }
      f += 1
    }
    out.toByteArray
  }
}
