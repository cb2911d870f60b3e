package graft.ops

/** Native companded / ADPCM audio codecs (public formats, integer-exact).
  *
  * Closes more of the compressed-audio class that the JDK's headless
  * `javax.sound` SPI cannot decode (it ships PCM WAV/AU/AIFF only — see
  * [[Multimodal.stubDecode]]'s closure note). Unlike the psychoacoustic
  * codecs (MP3/Vorbis/AAC), these are *deterministic* integer transforms:
  * encode→decode is reproducible bit-for-bit from the spec, so they can
  * meet the hash-equality oracle contract — the independent Python mirror
  * in `tools/gen_multimodal_oracle.py` re-derives the same samples with no
  * shared code.
  *
  *  - G.711 μ-law / A-law (ITU-T G.711): 16-bit linear ↔ 8-bit companded,
  *    the classic telephony format (WAVE format tags 7 and 6). The
  *    segmented-logarithm encode here is the canonical CCITT/Sun
  *    formulation (BIAS 0x84, CLIP 32635) used by virtually every
  *    implementation in the wild.
  *  - IMA/DVI ADPCM (WAVE format tag 0x11, IMA "Recommended Practices for
  *    Enhancing Digital Audio Compatibility", rev 3.00): 16-bit linear ↔
  *    4-bit differential nibbles with the 89-entry step table, block
  *    structured. Lossy, but the quantizer is fully integer — the decoded
  *    samples are a pure function of the input, which is what the p73
  *    oracle pins.
  *
  * Fixture writers / RIFF parsing live in [[Multimodal]]; this file is
  * sample-level codec math only, shared by the encoder (fixtures) and the
  * decoder (the real decode path).
  */
object G711 {

  private val Bias = 0x84
  private val Clip = 32635

  /** Highest-set-bit segment number 0..7 of an already-shifted magnitude. */
  @inline private def segment(v: Int): Int =
    if (v <= 0) 0 else math.min(7, 31 - Integer.numberOfLeadingZeros(v))

  /** 16-bit linear → 8-bit μ-law (CCITT encode: bias, segment, invert). */
  def linearToUlaw(pcmIn: Short): Byte = {
    var pcm: Int = pcmIn.toInt
    val sign = if (pcm < 0) 0x80 else 0x00
    if (pcm < 0) pcm = -pcm
    if (pcm > Clip) pcm = Clip
    pcm += Bias
    val exponent = segment((pcm >> 7) & 0xff)
    val mantissa = (pcm >> (exponent + 3)) & 0x0f
    (~(sign | (exponent << 4) | mantissa)).toByte
  }

  /** 8-bit μ-law → 16-bit linear (exact inverse of the segment layout). */
  def ulawToLinear(b: Byte): Short = {
    val u = (~b) & 0xff
    var t = (((u & 0x0f) << 3) + Bias) << ((u & 0x70) >> 4)
    t -= Bias
    (if ((u & 0x80) != 0) -t else t).toShort
  }

  /** A-law segment ends over the 13-bit folded magnitude. */
  private val SegAEnd = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  /** 16-bit linear → 8-bit A-law (canonical CCITT 13-bit formulation:
    * fold to 13 bits, segment search, even-bit 0x55 inversion).
    */
  def linearToAlaw(pcmIn: Short): Byte = {
    var pcm: Int = pcmIn.toInt >> 3 // 13-bit magnitude domain
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 1; 0x55 }
    if (pcm > 0xfff) pcm = 0xfff
    var seg = 0
    while (pcm > SegAEnd(seg)) seg += 1
    val aval =
      if (seg < 2) (seg << 4) | ((pcm >> 1) & 0x0f)
      else (seg << 4) | ((pcm >> seg) & 0x0f)
    (aval ^ mask).toByte
  }

  /** 8-bit A-law → 16-bit linear (exact inverse of the segment layout). */
  def alawToLinear(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xff
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= (seg - 1) }
    (if ((a & 0x80) != 0) t else -t).toShort
  }
}

/** IMA/DVI ADPCM block codec (mono). Block layout per the IMA spec: a
  * 4-byte header (predictor int16 LE, step index uint8, reserved 0) whose
  * predictor IS the block's first output sample, followed by 4-bit nibbles
  * (low nibble first within each byte), one sample each.
  */
object ImaAdpcm {

  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8,
    -1, -1, -1, -1, 2, 4, 6, 8)

  @inline private def clampIndex(i: Int): Int =
    if (i < 0) 0 else if (i > 88) 88 else i
  @inline private def clampSample(s: Int): Int =
    if (s < -32768) -32768 else if (s > 32767) 32767 else s

  /** Samples decodable from one block of `blockAlign` bytes (mono). */
  def samplesPerBlock(blockAlign: Int): Int = (blockAlign - 4) * 2 + 1

  /** Encode mono samples into ADPCM blocks of `blockAlign` bytes; the
    * final partial block is zero-padded (decoders stop at the `fact`
    * sample count). Returns the raw `data` chunk payload.
    */
  def encode(samples: Array[Int], blockAlign: Int): Array[Byte] = {
    val spb = samplesPerBlock(blockAlign)
    val nBlocks = (samples.length + spb - 1) / spb
    val out = new Array[Byte](nBlocks * blockAlign)
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * blockAlign
      val s0 = blk * spb
      var predictor = clampSample(samples(s0))
      var index = 0
      // seed the step index from the first real delta so the quantizer
      // starts near the signal's scale (any choice is valid per spec —
      // the header carries it; this one converges fast on sines)
      if (s0 + 1 < samples.length) {
        val d = math.abs(samples(s0 + 1) - predictor)
        while (index < 88 && StepTable(index) < d) index += 1
      }
      out(base) = (predictor & 0xff).toByte
      out(base + 1) = ((predictor >> 8) & 0xff).toByte
      out(base + 2) = index.toByte
      out(base + 3) = 0
      var i = 1
      while (i < spb) {
        val sampleIdx = s0 + i
        val target = if (sampleIdx < samples.length) samples(sampleIdx) else 0
        val step = StepTable(index)
        var diff = target - predictor
        var nibble = 0
        if (diff < 0) { nibble = 8; diff = -diff }
        var vpdiff = step >> 3
        var st = step
        if (diff >= st) { nibble |= 4; diff -= st; vpdiff += st }
        st >>= 1
        if (diff >= st) { nibble |= 2; diff -= st; vpdiff += st }
        st >>= 1
        if (diff >= st) { nibble |= 1; vpdiff += st }
        predictor = clampSample(
          if ((nibble & 8) != 0) predictor - vpdiff else predictor + vpdiff)
        index = clampIndex(index + IndexTable(nibble))
        val byteOff = base + 4 + (i - 1) / 2
        if (((i - 1) & 1) == 0) out(byteOff) = (nibble & 0x0f).toByte
        else out(byteOff) = (out(byteOff) | ((nibble & 0x0f) << 4)).toByte
        i += 1
      }
      blk += 1
    }
    out
  }

  /** Decode ADPCM `data` payload (mono) to `nSamples` 16-bit samples. */
  def decode(data: Array[Byte], blockAlign: Int, nSamples: Int): Array[Int] = {
    val spb = samplesPerBlock(blockAlign)
    val out = new Array[Int](nSamples)
    var blk = 0
    var written = 0
    while (written < nSamples && (blk + 1) * blockAlign <= data.length) {
      val base = blk * blockAlign
      var predictor =
        (((data(base + 1) << 8) | (data(base) & 0xff)).toShort).toInt
      var index = clampIndex(data(base + 2) & 0xff)
      out(written) = predictor
      written += 1
      var i = 1
      while (i < spb && written < nSamples) {
        val b = data(base + 4 + (i - 1) / 2) & 0xff
        val nibble = if (((i - 1) & 1) == 0) b & 0x0f else (b >> 4) & 0x0f
        val step = StepTable(index)
        var vpdiff = step >> 3
        if ((nibble & 4) != 0) vpdiff += step
        if ((nibble & 2) != 0) vpdiff += step >> 1
        if ((nibble & 1) != 0) vpdiff += step >> 2
        predictor = clampSample(
          if ((nibble & 8) != 0) predictor - vpdiff else predictor + vpdiff)
        index = clampIndex(index + IndexTable(nibble))
        out(written) = predictor
        written += 1
        i += 1
      }
      blk += 1
    }
    out
  }
}
