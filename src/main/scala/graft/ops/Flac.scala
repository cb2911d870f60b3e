package graft.ops

/** Pure-Scala FLAC codec — a from-scratch implementation of the public
  * FLAC bitstream format (RFC 9639 / xiph.org spec), no native code, no
  * dependencies. Closes the one remaining stub class in the multimodal
  * engine: compressed audio now takes a REAL decode path
  * ([[Multimodal.decode]] dispatches `fLaC` bytes here before the stub).
  *
  * Decoder coverage: STREAMINFO parsing (+ skip of all other metadata
  * block types), fixed- and variable-blocksize frames, all block-size /
  * sample-rate / sample-size codes, channel assignments 1-8 independent
  * plus left-side / right-side / mid-side stereo decorrelation, subframe
  * types CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32),
  * wasted-bits, Rice residual partitions (4- and 5-bit parameters,
  * escape-to-raw), CRC-8 header and CRC-16 frame verification, and the
  * STREAMINFO MD5 check over the reassembled PCM. Output is integer-exact
  * PCM — FLAC is lossless, so decode(encode(x)) == x bit for bit, which
  * is what makes the format oracle-able (FlacSpec round-trips every
  * subframe type; the p72 query's DuckDB oracle reuses p39's
  * independently-derived DSP literals because the FLAC fixture encodes
  * the SAME samples as the WAV fixture).
  *
  * Encoder coverage (fixture generator + differential test partner, the
  * role [[graft.graph.OsmPbfWriter]] plays for PBF): mono or stereo
  * input, per-frame subframe strategy cycling VERBATIM / FIXED 0-4 /
  * LPC(2) so every decoder path is exercised, stereo decorrelation
  * selectable, Rice parameter chosen per partition by exact cost count,
  * real STREAMINFO MD5. Not a rate-optimal encoder — a correctness
  * partner; losslessness never depends on predictor quality.
  *
  * Scale note: decode is per-blob CPU work inside `mapPartitions`
  * ([[Multimodal.extractFeatures]]) — embarrassingly parallel, no
  * shuffle; 100 TB of audio scales with executor count exactly like the
  * image path.
  */
object Flac {

  // ---------------------------------------------------------------- CRCs
  // CRC-8 poly x^8+x^2+x^1+1 (0x07), init 0; CRC-16 poly
  // x^16+x^15+x^2+1 (0x8005), init 0 — the two checks the frame format
  // mandates (RFC 9639 §9.1.1 / §9.3).
  private val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var k = 0
    while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
    c
  }
  private val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var k = 0
    while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
    c
  }
  private def crc8(buf: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Table((c ^ buf(i)) & 0xff); i += 1 }
    c
  }
  private def crc16(buf: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = ((c << 8) & 0xffff) ^ crc16Table(((c >> 8) ^ buf(i)) & 0xff); i += 1 }
    c
  }

  // ---------------------------------------------------------- bit reader
  /** MSB-first bit reader. Throws IndexOutOfBoundsException past the end —
    * the decoder entry point catches and returns None (malformed input is
    * data, not a crash).
    */
  private final class BitReader(val buf: Array[Byte]) {
    var pos: Int = 0      // byte position
    var bit: Int = 0      // bits consumed of buf(pos), 0..7

    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def alignToByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }

    def readBit(): Int = {
      val v = (buf(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }

    def readBits(n: Int): Long = {
      var v = 0L; var left = n
      while (left > 0) {
        val avail = 8 - bit
        val take = math.min(avail, left)
        val chunk = (buf(pos) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      v
    }

    def readBitsInt(n: Int): Int = readBits(n).toInt

    /** Signed two's-complement read. */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 0) 0
      else if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt
      else v.toInt
    }

    /** Unary: count of 0 bits before the terminating 1 (RFC 9639 §9.2.5). */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }

    /** UTF-8-style coded number, up to 36 bits (frame/sample number). */
    def readUtf8Number(): Long = {
      val b0 = readBitsInt(8)
      if ((b0 & 0x80) == 0) return b0
      var nCont = 0
      var mask = 0x40
      while ((b0 & mask) != 0 && nCont < 7) { nCont += 1; mask >>= 1 }
      var v: Long = b0 & (mask - 1)
      var i = 0
      while (i < nCont) {
        val c = readBitsInt(8)
        if ((c & 0xc0) != 0x80) throw new IllegalArgumentException("bad utf8 number")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  // ---------------------------------------------------------- bit writer
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0

    def writeBit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nAcc += 1
      if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
    }
    /** Chunked MSB-first write — fills the accumulator byte-at-a-time
      * instead of bit-at-a-time (the encoder's hot loop: a 16-bit verbatim
      * frame is ~70k bit appends otherwise).
      */
    def writeBits(v: Long, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - nAcc, left)
        val chunk = ((v >>> (left - take)) & ((1L << take) - 1)).toInt
        acc = (acc << take) | chunk
        nAcc += take
        if (nAcc == 8) { out.write(acc); acc = 0; nAcc = 0 }
        left -= take
      }
    }
    def writeUnary(q: Int): Unit = {
      var left = q
      while (left >= 8 - nAcc) {
        // flush zeros a byte at a time
        val take = 8 - nAcc
        acc <<= take; out.write(acc); acc = 0; left -= take; nAcc = 0
      }
      acc <<= left; nAcc += left
      writeBit(1)
    }
    def writeUtf8Number(v: Long): Unit = {
      if (v < 0x80) writeBits(v, 8)
      else {
        // nCont continuation bytes carry 6 bits each; the lead byte
        // carries 6 - nCont -> capacity 5·nCont + 6 bits total
        var nCont = 1
        while (v >= (1L << (5 * nCont + 6))) nCont += 1
        val leadPayload = 6 - nCont
        var lead = 0
        var m = 0
        while (m <= nCont) { lead |= (1 << (7 - m)); m += 1 }
        writeBits(lead | ((v >> (6 * nCont)) & ((1 << leadPayload) - 1)), 8)
        var i = nCont - 1
        while (i >= 0) { writeBits(0x80L | ((v >> (6 * i)) & 0x3f), 8); i -= 1 }
      }
    }
    def alignToByte(): Unit = while (nAcc != 0) writeBit(0)
    def toByteArray: Array[Byte] = { require(nAcc == 0); out.toByteArray }
  }

  // ------------------------------------------------------------- decoder
  final case class StreamInfo(minBlock: Int, maxBlock: Int,
                              sampleRate: Int, channels: Int,
                              bitsPerSample: Int, totalSamples: Long,
                              md5: Array[Byte])

  /** Decoded stream: per-channel integer PCM + stream parameters. */
  final case class Decoded(info: StreamInfo, channels: Array[Array[Int]]) {
    def sampleRate: Int = info.sampleRate
    def bitsPerSample: Int = info.bitsPerSample
    def nSamples: Int = if (channels.isEmpty) 0 else channels(0).length
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** Decode a complete FLAC stream. None when the bytes are not FLAC or
    * fail any structural/CRC/MD5 check — malformed media is data.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 42) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')) return None
    try {
      val br = new BitReader(bytes)
      br.pos = 4
      // metadata blocks
      var info: StreamInfo = null
      var last = false
      while (!last) {
        last = br.readBit() == 1
        val btype = br.readBitsInt(7)
        val len = br.readBitsInt(24)
        if (btype == 0) {
          val minB = br.readBitsInt(16); val maxB = br.readBitsInt(16)
          br.readBits(24); br.readBits(24) // min/max frame size (unused)
          val rate = br.readBitsInt(20)
          val nch = br.readBitsInt(3) + 1
          val bps = br.readBitsInt(5) + 1
          val total = br.readBits(36)
          val md5 = new Array[Byte](16)
          var i = 0
          while (i < 16) { md5(i) = br.readBitsInt(8).toByte; i += 1 }
          info = StreamInfo(minB, maxB, rate, nch, bps, total, md5)
        } else br.pos += len // skip padding/seektable/comment/etc
      }
      if (info == null) return None
      val out = Array.fill(info.channels)(new scala.collection.mutable.ArrayBuffer[Int]())
      // frames until end of buffer
      while (br.pos < bytes.length) {
        val frame = decodeFrame(br, info)
        var c = 0
        while (c < info.channels) { out(c) ++= frame(c); c += 1 }
      }
      val channels = out.map(_.toArray)
      // MD5 check over the interleaved little-endian PCM, when present
      if (info.md5.exists(_ != 0) && info.bitsPerSample % 8 == 0) {
        val digest = pcmMd5(channels, info.bitsPerSample)
        if (!java.util.Arrays.equals(digest, info.md5)) return None
      }
      Some(Decoded(info, channels))
    } catch { case _: Exception => None }
  }

  private def pcmMd5(channels: Array[Array[Int]], bps: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = bps / 8
    val n = if (channels.isEmpty) 0 else channels(0).length
    val buf = new Array[Byte](channels.length * bytesPer)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels.length) {
        val v = channels(c)(i)
        var b = 0
        while (b < bytesPer) { buf(c * bytesPer + b) = ((v >> (8 * b)) & 0xff).toByte; b += 1 }
        c += 1
      }
      md.update(buf)
      i += 1
    }
    md.digest()
  }

  /** One frame: per-channel sample arrays, decorrelated. */
  private def decodeFrame(br: BitReader, info: StreamInfo): Array[Array[Int]] = {
    require(br.aligned)
    val frameStart = br.pos
    val sync = br.readBitsInt(14)
    require(sync == 0x3ffe, "bad sync")
    require(br.readBit() == 0, "reserved")
    br.readBit() // blocking strategy (number semantics only)
    val bsCode = br.readBitsInt(4)
    val srCode = br.readBitsInt(4)
    val chCode = br.readBitsInt(4)
    val ssCode = br.readBitsInt(3)
    require(br.readBit() == 0, "reserved")
    br.readUtf8Number() // frame/sample number
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("reserved block size")
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => br.readBitsInt(8) + 1
      case 7 => br.readBitsInt(16) + 1
      case n => 256 << (n - 8)
    }
    srCode match { // value parsed for CRC coverage; frames carry no DSP use here
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => throw new IllegalArgumentException("invalid sample rate code")
      case _ => ()
    }
    val headerCrc = br.readBitsInt(8)
    require(br.aligned)
    require(crc8(br.buf, frameStart, br.pos - 1) == headerCrc, "frame header CRC-8")
    val bps = ssCode match {
      case 0 => info.bitsPerSample
      case 1 => 8
      case 2 => 12
      case 3 => throw new IllegalArgumentException("reserved sample size")
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
    }
    val nCh = if (chCode <= 7) chCode + 1 else 2
    require(nCh == info.channels, "channel count mismatch")
    val raw = new Array[Array[Int]](nCh)
    var c = 0
    while (c < nCh) {
      // the SIDE channel of a decorrelated pair carries one extra bit
      val extra = chCode match {
        case 8 => if (c == 1) 1 else 0  // left-side
        case 9 => if (c == 0) 1 else 0  // right-side (side is channel 0)
        case 10 => if (c == 1) 1 else 0 // mid-side
        case _ => 0
      }
      raw(c) = decodeSubframe(br, blockSize, bps + extra)
      c += 1
    }
    br.alignToByte()
    val frameCrc = br.readBitsInt(16)
    require(crc16(br.buf, frameStart, br.pos - 2) == frameCrc, "frame CRC-16")
    // stereo decorrelation
    chCode match {
      case 8 => // left-side: ch0 = L, ch1 = side; R = L - S
        var i = 0
        while (i < blockSize) { raw(1)(i) = raw(0)(i) - raw(1)(i); i += 1 }
      case 9 => // right-side: ch0 = side, ch1 = R; L = R + S
        var i = 0
        while (i < blockSize) {
          val s = raw(0)(i); raw(0)(i) = raw(1)(i) + s; i += 1
        }
      case 10 => // mid-side
        var i = 0
        while (i < blockSize) {
          val s = raw(1)(i)
          val m = (raw(0)(i) << 1) | (s & 1)
          raw(0)(i) = (m + s) >> 1
          raw(1)(i) = (m - s) >> 1
          i += 1
        }
      case _ => ()
    }
    raw
  }

  private def decodeSubframe(br: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    require(br.readBit() == 0, "subframe padding")
    val stype = br.readBitsInt(6)
    val wasted =
      if (br.readBit() == 1) br.readUnary() + 1
      else 0
    val effBps = bps - wasted
    val out = new Array[Int](blockSize)
    if (stype == 0) { // CONSTANT
      val v = br.readSigned(effBps)
      java.util.Arrays.fill(out, v)
    } else if (stype == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.readSigned(effBps); i += 1 }
    } else if ((stype & 0x38) == 0x08 && (stype & 0x07) <= 4) { // FIXED
      val order = stype & 0x07
      var i = 0
      while (i < order) { out(i) = br.readSigned(effBps); i += 1 }
      decodeResidual(br, blockSize, order, out)
      val coefs = FixedCoefs(order)
      i = order
      while (i < blockSize) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + pred).toInt
        i += 1
      }
    } else if ((stype & 0x20) != 0) { // LPC
      val order = (stype & 0x1f) + 1
      var i = 0
      while (i < order) { out(i) = br.readSigned(effBps); i += 1 }
      val precision = br.readBitsInt(4) + 1
      require(precision <= 15, "invalid qlp precision")
      val shift = br.readSigned(5)
      require(shift >= 0, "negative qlp shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      decodeResidual(br, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + (pred >> shift)).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe type $stype")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual into out(order until blockSize) (values remain
    * residuals; prediction is applied by the caller).
    */
  private def decodeResidual(br: BitReader, blockSize: Int, order: Int,
                             out: Array[Int]): Unit = {
    val method = br.readBitsInt(2)
    require(method <= 1, "reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = br.readBitsInt(4)
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0, "partition order mismatch")
    val partLen = blockSize >> partOrder
    require(partLen > order || partOrder == 0, "bad first partition")
    var p = 0
    var idx = order
    while (p < nParts) {
      val n = if (p == 0) partLen - order else partLen
      val param = br.readBitsInt(paramBits)
      if (param == escape) {
        val rawBits = br.readBitsInt(5)
        var i = 0
        while (i < n) { out(idx) = br.readSigned(rawBits); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = br.readUnary()
          val u = (q.toLong << param) | br.readBits(param)
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  // ------------------------------------------------------------- encoder

  /** Stereo decorrelation modes the encoder can emit. */
  object Stereo extends Enumeration {
    val Independent, LeftSide, RightSide, MidSide = Value
  }

  /** Encode PCM to a FLAC stream. `samples` is one array per channel (1-8
    * channels; decorrelation applies to exactly 2). The per-frame subframe
    * strategy cycles VERBATIM → FIXED 0..4 → LPC(2) keyed by frame index,
    * so a multi-frame stream exercises every decoder path; losslessness
    * is independent of the choice.
    */
  def encode(samples: Array[Array[Int]], sampleRate: Int = 44100,
             bps: Int = 16, blockSize: Int = 576,
             stereo: Stereo.Value = Stereo.Independent): Array[Byte] = {
    require(samples.nonEmpty && samples.length <= 8)
    require(samples.forall(_.length == samples(0).length))
    val nCh = samples.length
    val total = samples(0).length
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    // STREAMINFO (34 bytes), last metadata block
    val si = new BitWriter
    si.writeBits(1, 1); si.writeBits(0, 7); si.writeBits(34, 24)
    si.writeBits(blockSize, 16); si.writeBits(blockSize, 16)
    si.writeBits(0, 24); si.writeBits(0, 24)
    si.writeBits(sampleRate, 20); si.writeBits(nCh - 1, 3); si.writeBits(bps - 1, 5)
    si.writeBits(total, 36)
    val md5 = pcmMd5(samples, bps)
    md5.foreach(b => si.writeBits(b & 0xffL, 8))
    out.write(si.toByteArray)

    var frameIdx = 0
    var off = 0
    while (off < total) {
      val n = math.min(blockSize, total - off)
      out.write(encodeFrame(samples, off, n, frameIdx, sampleRate, bps,
        blockSize, stereo))
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }

  private def encodeFrame(samples: Array[Array[Int]], off: Int, n: Int,
                          frameIdx: Int, sampleRate: Int, bps: Int,
                          nominalBlock: Int, stereo: Stereo.Value): Array[Byte] = {
    val nCh = samples.length
    val bw = new BitWriter
    bw.writeBits(0x3ffe, 14)
    bw.writeBit(0) // reserved
    bw.writeBit(0) // fixed blocksize
    // block size code: nominal sizes that have a code use it, the tail
    // frame takes the 16-bit-minus-1 form
    val bsCode =
      if (n == 192) 1
      else if (n == 576) 2 else if (n == 1152) 3 else if (n == 2304) 4 else if (n == 4608) 5
      else if (n == 256) 8 else if (n == 512) 9 else if (n == 1024) 10 else if (n == 2048) 11
      else if (n == 4096) 12 else if (n == 8192) 13 else if (n == 16384) 14 else if (n == 32768) 15
      else 7
    bw.writeBits(bsCode, 4)
    val srCode = sampleRate match {
      case 88200 => 1; case 176400 => 2; case 192000 => 3; case 8000 => 4
      case 16000 => 5; case 22050 => 6; case 24000 => 7; case 32000 => 8
      case 44100 => 9; case 48000 => 10; case 96000 => 11
      case r if r % 10 == 0 && r / 10 <= 65535 => 14
      case r if r <= 65535 => 13
      case _ => 0
    }
    bw.writeBits(srCode, 4)
    val chCode =
      if (nCh == 2 && stereo == Stereo.LeftSide) 8
      else if (nCh == 2 && stereo == Stereo.RightSide) 9
      else if (nCh == 2 && stereo == Stereo.MidSide) 10
      else nCh - 1
    bw.writeBits(chCode, 4)
    val ssCode = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6; case 32 => 7
      case _ => 0
    }
    bw.writeBits(ssCode, 3)
    bw.writeBit(0) // reserved
    bw.writeUtf8Number(frameIdx.toLong)
    if (bsCode == 6) bw.writeBits(n - 1, 8)
    if (bsCode == 7) bw.writeBits(n - 1, 16)
    if (srCode == 12) bw.writeBits(sampleRate / 1000, 8)
    if (srCode == 13) bw.writeBits(sampleRate, 16)
    if (srCode == 14) bw.writeBits(sampleRate / 10, 16)
    bw.alignToByte()
    val headerNoCrc = bw.toByteArray
    val withCrc8 = new java.io.ByteArrayOutputStream()
    withCrc8.write(headerNoCrc)
    withCrc8.write(crc8(headerNoCrc, 0, headerNoCrc.length))

    // channel payloads after decorrelation
    val chans: Array[(Array[Int], Int)] = chCode match {
      case 8 =>
        val l = java.util.Arrays.copyOfRange(samples(0), off, off + n)
        val s = Array.tabulate(n)(i => samples(0)(off + i) - samples(1)(off + i))
        Array((l, bps), (s, bps + 1))
      case 9 =>
        val s = Array.tabulate(n)(i => samples(0)(off + i) - samples(1)(off + i))
        val r = java.util.Arrays.copyOfRange(samples(1), off, off + n)
        Array((s, bps + 1), (r, bps))
      case 10 =>
        val m = Array.tabulate(n)(i => (samples(0)(off + i) + samples(1)(off + i)) >> 1)
        val s = Array.tabulate(n)(i => samples(0)(off + i) - samples(1)(off + i))
        Array((m, bps), (s, bps + 1))
      case _ =>
        samples.map(ch => (java.util.Arrays.copyOfRange(ch, off, off + n), bps))
    }

    val body = new BitWriter
    var c = 0
    while (c < chans.length) {
      val (data, chBps) = chans(c)
      encodeSubframe(body, data, chBps, (frameIdx + c) % 7)
      c += 1
    }
    body.alignToByte()
    val payload = body.toByteArray
    withCrc8.write(payload)
    val sofar = withCrc8.toByteArray
    val fcrc = crc16(sofar, 0, sofar.length)
    withCrc8.write((fcrc >> 8) & 0xff)
    withCrc8.write(fcrc & 0xff)
    withCrc8.toByteArray
  }

  /** strategy 0: VERBATIM; 1-5: FIXED order 0-4; 6: LPC order 2. */
  private def encodeSubframe(bw: BitWriter, data: Array[Int], bps: Int,
                             strategy: Int): Unit = {
    val n = data.length
    bw.writeBit(0)
    if (strategy == 0 || n < 8) {
      bw.writeBits(1, 6) // VERBATIM
      bw.writeBit(0)     // no wasted bits
      var i = 0
      while (i < n) { bw.writeBits(data(i).toLong & ((1L << bps) - 1), bps); i += 1 }
    } else if (strategy <= 5) {
      val order = strategy - 1
      bw.writeBits(0x08 | order, 6)
      bw.writeBit(0)
      var i = 0
      while (i < order) { bw.writeBits(data(i).toLong & ((1L << bps) - 1), bps); i += 1 }
      val res = new Array[Int](n - order)
      val coefs = FixedCoefs(order)
      i = order
      while (i < n) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * data(i - 1 - j); j += 1 }
        res(i - order) = (data(i) - pred).toInt
        i += 1
      }
      writeResidual(bw, res, n, order)
    } else {
      // LPC order 2: fixed deterministic coefficients approximating
      // 2·x(n-1) − x(n-2) at shift 6 — suboptimal on purpose (losslessness
      // does not depend on the predictor; this just exercises the path)
      val order = 2
      val precision = 15
      val shift = 6
      val coefs = Array(131, -66)
      bw.writeBits(0x20 | (order - 1), 6)
      bw.writeBit(0)
      var i = 0
      while (i < order) { bw.writeBits(data(i).toLong & ((1L << bps) - 1), bps); i += 1 }
      bw.writeBits(precision - 1, 4)
      bw.writeBits(shift, 5)
      coefs.foreach(cf => bw.writeBits(cf.toLong & ((1L << precision) - 1), precision))
      val res = new Array[Int](n - order)
      i = order
      while (i < n) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coefs(j).toLong * data(i - 1 - j); j += 1 }
        res(i - order) = (data(i) - (pred >> shift)).toInt
        i += 1
      }
      writeResidual(bw, res, n, order)
    }
  }

  /** Partition order 0, 4-bit Rice parameter chosen by exact bit count;
    * escapes to raw when Rice cannot beat it.
    */
  private def writeResidual(bw: BitWriter, res: Array[Int], blockSize: Int,
                            predOrder: Int): Unit = {
    bw.writeBits(0, 2) // method: 4-bit params
    bw.writeBits(0, 4) // partition order 0
    val zig = res.map(r => ((r.toLong << 1) ^ (r.toLong >> 63)))
    var bestP = -1
    var bestBits = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var bits = 0L
      var i = 0
      while (i < zig.length) { bits += (zig(i) >>> p) + 1 + p; i += 1 }
      if (bits < bestBits) { bestBits = bits; bestP = p }
      p += 1
    }
    val maxBits = zig.foldLeft(0)((m, u) => math.max(m, 64 - java.lang.Long.numberOfLeadingZeros(u | 1L).toInt)) + 1
    if (bestBits > zig.length.toLong * math.min(31, maxBits)) {
      bw.writeBits(0xf, 4) // escape
      val rawBits = math.min(31, maxBits)
      bw.writeBits(rawBits, 5)
      var i = 0
      while (i < res.length) { bw.writeBits(res(i).toLong & ((1L << rawBits) - 1), rawBits); i += 1 }
    } else {
      bw.writeBits(bestP, 4)
      var i = 0
      while (i < zig.length) {
        bw.writeUnary((zig(i) >>> bestP).toInt)
        bw.writeBits(zig(i) & ((1L << bestP) - 1), bestP)
        i += 1
      }
    }
  }
}
