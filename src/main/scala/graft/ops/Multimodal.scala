package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed batch-wise in `mapPartitions`.
  *
  * IMAGE decode is REAL: `javax.imageio` (JDK built-in, no new deps)
  * handles JPEG/PNG/GIF/BMP, and [[decode]] pools actual pixels into the
  * fixed-shape feature vector. Codecs the JDK lacks (audio resample, video
  * keyframes) remain a clearly-marked deterministic STUB ([[stubDecode]]).
  * Everything Spark-side is shared and load-bearing either way: the schema
  * contract, the partition-wise batch loop that amortizes decoder setup,
  * the fixed-shape feature output, and the downstream joinability.
  *
  * Scale design: decode is the classic CPU-heavy embarrassingly-parallel
  * stage — `mapPartitions` keeps it shuffle-free on top of the scan, and the
  * fixed-width output schema keeps Tungsten row size predictable at 100 TB.
  */
object Multimodal {

  final val FeatureDim = 8

  /** Typed metadata for an opaque media blob. */
  final case class MediaMeta(format: String, nBytes: Long, checksum: Long)

  /** Real image decode: JDK ImageIO (JPEG/PNG/GIF/BMP) → pixel pooling into
    * [[FeatureDim]] features: mean R, G, B, mean luma, and per-quadrant mean
    * luma (2×2 spatial pooling). None when the bytes are not a decodable
    * image.
    */
  def decodeImage(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.length < 8) return None
    val raw =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (raw == null) return None
    // EXIF orientation (VERDICT r12 #9): JPEG pixels are STORED in
    // whatever rotation the camera wrote; the APP1 tag says how to
    // display them. Applying it before pooling makes physically-
    // identical photos with different orientation tags featurize
    // identically (quadrant pooling is rotation-sensitive).
    val img =
      if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        applyOrientation(raw, exifOrientation(bytes))
      else raw
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    poolImage(img)
  }

  /** The 2×2-quadrant feature pooling over decoded pixels. */
  private[graft] def poolImage(img: java.awt.image.BufferedImage): Option[Array[Float]] = {
    val w = img.getWidth; val h = img.getHeight
    var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
    val quadLuma = new Array[Double](4)
    val quadN = new Array[Int](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sumR += r; sumG += g; sumB += b
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        quadLuma(q) += 0.299 * r + 0.587 * g + 0.114 * b
        quadN(q) += 1
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val out = new Array[Float](FeatureDim)
    out(0) = (sumR / n / 255.0).toFloat
    out(1) = (sumG / n / 255.0).toFloat
    out(2) = (sumB / n / 255.0).toFloat
    out(3) = ((0.299 * sumR + 0.587 * sumG + 0.114 * sumB) / n / 255.0).toFloat
    var q = 0
    while (q < 4) {
      out(4 + q) = if (quadN(q) == 0) 0f else (quadLuma(q) / quadN(q) / 255.0).toFloat
      q += 1
    }
    Some(out)
  }

  /** The EXIF orientation of a JPEG (1 when absent or malformed — the
    * tag is a display HINT; a broken Exif block must not refuse an
    * otherwise-decodable image, the browser behavior). Walks the JPEG
    * marker segments to APP1 "Exif" (NUL-NUL terminated), then the TIFF IFD0 for
    * tag 0x0112 (SHORT), honoring both byte orders.
    */
  private[graft] def exifOrientation(bytes: Array[Byte]): Int = {
    try {
      var p = 2
      while (p + 4 <= bytes.length && (bytes(p) & 0xff) == 0xff) {
        val marker = bytes(p + 1) & 0xff
        if (marker == 0xda || marker == 0xd9) return 1 // SOS/EOI: no Exif
        val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > bytes.length) return 1
        if (marker == 0xe1 && len >= 2 + 6 + 8 &&
          bytes(p + 4) == 'E' && bytes(p + 5) == 'x' && bytes(p + 6) == 'i' &&
          bytes(p + 7) == 'f' && bytes(p + 8) == 0 && bytes(p + 9) == 0) {
          val base = p + 10
          val le = (bytes(base) & 0xff) == 'I'
          def u16(o: Int): Int = {
            if (o < 0 || o + 2 > bytes.length) return -1
            if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
            else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
          }
          def u32(o: Int): Long = {
            if (o < 0 || o + 4 > bytes.length) return -1L
            if (le) (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
            else ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
          }
          if (u16(base + 2) != 42) return 1
          val ifd = u32(base + 4)
          if (ifd < 0) return 1
          val at = base + ifd.toInt
          val n = u16(at)
          var i = 0
          while (i >= 0 && i < n) {
            val e = at + 2 + i * 12
            if (u16(e) == 0x0112 && u16(e + 2) == 3) {
              val v = u16(e + 8)
              return if (v >= 1 && v <= 8) v else 1
            }
            i += 1
          }
          return 1
        }
        p += 2 + len
      }
      1
    } catch { case _: ArrayIndexOutOfBoundsException => 1 }
  }

  /** Remap stored pixels to display orientation (EXIF tag semantics:
    * 2 flip-H, 3 rot-180, 4 flip-V, 5 transpose, 6 rot-90-CW,
    * 7 transverse, 8 rot-270-CW). Identity for 1 or out-of-range.
    */
  private[graft] def applyOrientation(img: java.awt.image.BufferedImage,
                                      o: Int): java.awt.image.BufferedImage = {
    if (o <= 1 || o > 8) return img
    val w = img.getWidth; val h = img.getHeight
    val swap = o >= 5
    val out = new java.awt.image.BufferedImage(
      if (swap) h else w, if (swap) w else h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        o match {
          case 2 => out.setRGB(w - 1 - x, y, rgb)
          case 3 => out.setRGB(w - 1 - x, h - 1 - y, rgb)
          case 4 => out.setRGB(x, h - 1 - y, rgb)
          case 5 => out.setRGB(y, x, rgb)
          case 6 => out.setRGB(h - 1 - y, x, rgb)
          case 7 => out.setRGB(h - 1 - y, w - 1 - x, rgb)
          case _ => out.setRGB(y, w - 1 - x, rgb)
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Fixture-side: prepend an APP1 Exif block carrying `orientation`
    * right after SOI (big-endian TIFF, one IFD0 entry).
    */
  def withExifOrientation(jpeg: Array[Byte], orientation: Int): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    require(orientation >= 1 && orientation <= 8, s"bad orientation $orientation")
    val tiff = Array[Byte](
      'M', 'M', 0, 42, 0, 0, 0, 8, // big-endian header, IFD0 at 8
      0, 1,                        // one entry
      0x01, 0x12, 0, 3, 0, 0, 0, 1, // tag 0x0112, SHORT, count 1
      0, orientation.toByte, 0, 0,  // value, left-justified
      0, 0, 0, 0)                   // no next IFD
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff
    val len = payload.length + 2
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Real audio decode: JDK javax.sound (headless-safe for PCM WAV/AIFF —
    * no native codec needed) → sample features: overall RMS, zero-crossing
    * rate, mean amplitude, peak, and per-quarter RMS (temporal pooling,
    * the audio analogue of [[decodeImage]]'s 2×2 spatial pooling). None
    * when the bytes are not a decodable audio container.
    */
  def decodeAudio(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.length < 12) return None
    val in =
      try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return None }
    try {
      val fmt = in.getFormat
      // mono only: interleaved multi-channel frames would be read as one
      // stream, corrupting ZCR (channel-interleave sign flips) and pooling
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return None
      val raw = in.readAllBytes()
      val n = raw.length / 2
      if (n == 0) return None
      val samples = new Array[Double](n)
      val le = !fmt.isBigEndian
      var i = 0
      while (i < n) {
        val lo = raw(2 * i) & 0xff; val hi = raw(2 * i + 1) & 0xff
        val v = if (le) (hi << 8) | lo else (lo << 8) | hi
        samples(i) = v.toShort / 32768.0
        i += 1
      }
      Some(audioFeatures(samples))
    } finally in.close()
  }

  /** The shared audio feature kernel: RMS, zero-crossing rate, mean
    * |amplitude|, peak, per-quarter RMS over normalized [-1, 1) samples —
    * one formula for every container (WAV/AIFF via javax.sound, FLAC via
    * the native [[Flac]] decoder), so identical samples give bit-identical
    * features regardless of how they were compressed.
    */
  private def audioFeatures(samples: Array[Double]): Array[Float] = {
    val n = samples.length
    var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0; var zc = 0
    val quarterSq = new Array[Double](4)
    var i = 0
    while (i < n) {
      val s = samples(i)
      sumSq += s * s; sumAbs += math.abs(s); peak = math.max(peak, math.abs(s))
      if (i > 0 && (samples(i - 1) >= 0) != (s >= 0)) zc += 1
      quarterSq(math.min(3, i * 4 / n)) += s * s
      i += 1
    }
    val out = new Array[Float](FeatureDim)
    out(0) = math.sqrt(sumSq / n).toFloat            // rms
    out(1) = (zc.toDouble / n).toFloat               // zero-crossing rate
    out(2) = (sumAbs / n).toFloat                    // mean |amplitude|
    out(3) = peak.toFloat
    var q = 0
    while (q < 4) {
      out(4 + q) = math.sqrt(quarterSq(q) / math.max(1, n / 4)).toFloat
      q += 1
    }
    out
  }

  /** Real COMPRESSED audio decode: the native pure-Scala [[Flac]] decoder
    * (the JDK's javax.sound SPI carries no compressed formats on a
    * headless install). Same mono/16-bit feature contract as
    * [[decodeAudio]]; because FLAC is lossless, a FLAC encode of the WAV
    * fixture's samples produces byte-identical features — which is what
    * lets the p72 oracle reuse p39's independently-derived DSP literals.
    */
  def decodeFlacAudio(bytes: Array[Byte]): Option[Array[Float]] =
    Flac.decode(bytes).flatMap { d =>
      if (d.info.channels != 1 || d.bitsPerSample != 16 || d.nSamples == 0) None
      else {
        val pcm = d.channels(0)
        val samples = new Array[Double](pcm.length)
        var i = 0
        while (i < pcm.length) { samples(i) = pcm(i) / 32768.0; i += 1 }
        Some(audioFeatures(samples))
      }
    }

  /** Companded / ADPCM WAV decode: a native RIFF chunk walk (the JDK SPI
    * rejects every non-PCM format tag on a headless install) dispatching
    * on `wFormatTag` — 6 = A-law, 7 = μ-law (both [[G711]]), 0x11 =
    * IMA/DVI ADPCM ([[ImaAdpcm]]). Mono only, same feature contract as
    * [[decodeAudio]]. The sample count comes from the `fact` chunk when
    * present (required for ADPCM's zero-padded final block), else from
    * the data size.
    */
  def decodeCompandedAudio(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.length < 36 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E')
      return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmtTag = -1; var channels = -1; var blockAlign = -1
    var factSamples = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = buf.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          fmtTag = buf.getShort(off + 8) & 0xffff
          channels = buf.getShort(off + 10) & 0xffff
          blockAlign = buf.getShort(off + 20) & 0xffff
        case "fact" if size >= 4 => factSamples = buf.getInt(off + 8)
        case "data" => dataOff = off + 8; dataLen = size
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels != 1 || dataOff < 0) return None
    val samples: Array[Double] = fmtTag match {
      case 6 | 7 =>
        val n = if (factSamples >= 0) math.min(factSamples, dataLen) else dataLen
        val s = new Array[Double](n)
        var i = 0
        while (i < n) {
          val v = if (fmtTag == 7) G711.ulawToLinear(bytes(dataOff + i))
                  else G711.alawToLinear(bytes(dataOff + i))
          s(i) = v / 32768.0
          i += 1
        }
        s
      case 0x11 if blockAlign > 4 =>
        val nBlocks = dataLen / blockAlign
        val maxN = nBlocks * ImaAdpcm.samplesPerBlock(blockAlign)
        val n = if (factSamples >= 0) math.min(factSamples, maxN) else maxN
        val data = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + dataLen)
        val pcm = ImaAdpcm.decode(data, blockAlign, n)
        val s = new Array[Double](n)
        var i = 0
        while (i < n) { s(i) = pcm(i) / 32768.0; i += 1 }
        s
      case _ => return None
    }
    if (samples.isEmpty) None else Some(audioFeatures(samples))
  }

  /** Real VIDEO decode: uncompressed-DIB AVI (RIFF 'AVI ', BI_RGB 24-bit
    * bottom-up frames in '00db'/'00dc' chunks — the classic raw AVI the
    * Microsoft AVI/OpenDML spec defines; rows padded to 4 bytes). The JDK
    * ships no video framework at all, so the container walk and frame
    * unpack are native here; intra-coded codecs (H.264 &c.) stay stubbed —
    * their float DCT output could never meet the hash-equality oracle,
    * while raw DIB frames are integer-exact.
    *
    * Features ([[FeatureDim]] = 8): mean R, G, B and mean luma pooled over
    * ALL frames' pixels (the image contract, indices 0-3) plus per
    * temporal-quarter mean luma (indices 4-7 — the audio contract's
    * time pooling, quarter = min(3, frame*4/nFrames)). None when the bytes
    * are not a decodable-here AVI.
    */
  def decodeAviVideo(bytes: Array[Byte]): Option[Array[Float]] = parseAvi(bytes).map { avi =>
    import avi.{w, h, stride, frames}
    val nF = frames.length
    var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
    val quarterLuma = new Array[Double](4)
    val quarterN = new Array[Long](4)
    var f = 0
    while (f < nF) {
      val base = frames(f)
      val q = math.min(3, f * 4 / nF)
      var row = 0
      while (row < h) { // stored bottom-up; sums pool every pixel anyway
        var x = 0
        val ro = base + row * stride
        while (x < w) {
          val b = bytes(ro + 3 * x) & 0xff
          val g = bytes(ro + 3 * x + 1) & 0xff
          val r = bytes(ro + 3 * x + 2) & 0xff
          sumR += r; sumG += g; sumB += b
          quarterLuma(q) += 0.299 * r + 0.587 * g + 0.114 * b
          quarterN(q) += 1
          x += 1
        }
        row += 1
      }
      f += 1
    }
    val n = nF.toDouble * w * h
    val out = new Array[Float](FeatureDim)
    out(0) = (sumR / n / 255.0).toFloat
    out(1) = (sumG / n / 255.0).toFloat
    out(2) = (sumB / n / 255.0).toFloat
    out(3) = ((0.299 * sumR + 0.587 * sumG + 0.114 * sumB) / n / 255.0).toFloat
    var q = 0
    while (q < 4) {
      out(4 + q) =
        if (quarterN(q) == 0) 0f
        else (quarterLuma(q) / quarterN(q) / 255.0).toFloat
      q += 1
    }
    out
  }

  /** Parsed uncompressed-AVI geometry: frame data offsets into the
    * original byte array plus the DIB geometry needed to read them
    * (bottom-up rows, `stride` = width*3 rounded up to 4 bytes).
    */
  private[graft] final case class AviDib(w: Int, h: Int, stride: Int,
                                         frames: Array[Int])

  /** Raw RIFF/AVI walk output: video-stream geometry, BITMAPINFOHEADER
    * codec fields, the 8-bit palette when one is declared (RGBQUAD order:
    * B,G,R,reserved — stored here as packed 0xRRGGBB ints), and every movi
    * frame chunk as (dataOffset, size).
    */
  private[graft] final case class AviRaw(w: Int, h: Int, bitCount: Int,
                                         compression: Int,
                                         palette: Array[Int],
                                         frameOff: Array[Int],
                                         frameLen: Array[Int])

  /** Native RIFF/AVI container walk, codec-agnostic: collects geometry +
    * palette + frame chunks; [[parseAvi]] (BI_RGB) and [[decodeRle8Video]]
    * (BI_RLE8) apply their codec-specific validation on top.
    */
  private[graft] def walkAvi(bytes: Array[Byte]): Option[AviRaw] = {
    if (bytes == null || bytes.length < 24 ||
      bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'A' || bytes(9) != 'V' || bytes(10) != 'I' || bytes(11) != ' ')
      return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var w = -1; var h = -1; var bitCount = -1; var compression = -1
    var palette: Array[Int] = Array.emptyIntArray
    var lastStrh = ""
    val frameOff = scala.collection.mutable.ArrayBuffer.empty[Int]
    val frameLen = scala.collection.mutable.ArrayBuffer.empty[Int]
    var bad = false
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (!bad && off + 8 <= end) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val size = buf.getInt(off + 4)
        // Long arithmetic: a declared size near Int.MaxValue would wrap
        // `off + 8 + size` negative and slip past an Int-typed guard.
        if (size < 0 || off.toLong + 8L + size > end) { bad = true; return }
        if (id == "LIST" || id == "RIFF") {
          if (size >= 4) {
            val lt = new String(bytes, off + 8, 4, "US-ASCII")
            walk(off + 12, off + 8 + size, inMovi || lt == "movi")
          }
        } else if (inMovi && (id.endsWith("db") || id.endsWith("dc"))) {
          frameOff += off + 8; frameLen += size
        } else if (id == "strh" && size >= 4) {
          lastStrh = new String(bytes, off + 8, 4, "US-ASCII")
        } else if (id == "strf" && lastStrh == "vids" && size >= 40) {
          w = buf.getInt(off + 12); h = buf.getInt(off + 16)
          bitCount = buf.getShort(off + 22) & 0xffff
          compression = buf.getInt(off + 24)
          if (bitCount == 8 && size >= 44) {
            val declared = buf.getInt(off + 40) // biClrUsed
            val n = math.min(if (declared > 0) declared else 256,
              (size - 40) / 4)
            palette = Array.tabulate(math.max(0, n)) { c =>
              val p = off + 48 + 4 * c
              ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 1) & 0xff) << 8) |
                (bytes(p) & 0xff)
            }
          }
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, bytes.length, inMovi = false)
    if (bad || w <= 0 || h <= 0 || frameOff.isEmpty) None
    else Some(AviRaw(w, h, bitCount, compression, palette,
      frameOff.toArray, frameLen.toArray))
  }

  /** BI_RGB validation over [[walkAvi]]: 24-bit uncompressed with
    * equal-size frame chunks matching the padded-stride geometry.
    */
  private[graft] def parseAvi(bytes: Array[Byte]): Option[AviDib] =
    walkAvi(bytes).flatMap { raw =>
      val stride = ((raw.w * 3 + 3) / 4) * 4
      if (raw.bitCount != 24 || raw.compression != 0 ||
        !raw.frameLen.forall(_ == stride * raw.h)) None
      else Some(AviDib(raw.w, raw.h, stride, raw.frameOff))
    }

  /** Decode dispatch: real pixels when ImageIO reads the bytes, real PCM
    * samples when javax.sound does (WAV/AIFF) or the native [[Flac]]
    * decoder does (compressed audio) or the native [[G711]]/[[ImaAdpcm]]
    * codecs do (companded / ADPCM WAV), real frames when the native
    * [[decodeAviVideo]] / [[decodeRle8Video]] walks read an uncompressed
    * or RLE AVI or the real ImageIO JPEG codec reads an MJPEG AVI's
    * frames ([[decodeMjpegVideo]]) — the deterministic stub only for
    * formats nothing here can decode (psychoacoustic audio,
    * inter-predicted DCT video).
    */
  def decode(bytes: Array[Byte]): Array[Float] = decodeWithKind(bytes)._2

  /** One dispatch pass returning BOTH the routing label and the features —
    * the kernel behind `media_decode` (and [[decode]] / `media_kind`), so
    * a query that wants kind + features pays ONE decode, not two. Labels
    * match [[graft.functions.MediaKind]]'s documented vocabulary.
    */
  def decodeWithKind(bytes: Array[Byte]): (String, Array[Float]) =
    decodeImage(bytes).map(("image", _))
      .orElse(decodeAudio(bytes).map(("audio", _)))
      .orElse(decodeFlacAudio(bytes).map(("flac", _)))
      .orElse(decodeCompandedAudio(bytes).map(("companded", _)))
      .orElse(decodeAviVideo(bytes).map(("video", _)))
      .orElse(decodeRle8Video(bytes).map(("rle_video", _)))
      .orElse(decodeMjpegVideo(bytes).map(("mjpeg_video", _)))
      .orElse(decodePdfDoc(bytes).map(("pdf", _)))
      .orElse(decodeDocxDoc(bytes).map(("docx", _)))
      .orElse(decodePptxDoc(bytes).map(("pptx", _)))
      .orElse(decodeXlsxDoc(bytes).map(("xlsx", _)))
      .orElse(decodeMp3Doc(bytes).map(("mp3", _)))
      .orElse(decodeRtfDoc(bytes).map(("rtf", _)))
      .orElse(decodeLegacyDoc(bytes).map(("doc", _)))
      .orElse(decodeLegacyXls(bytes).map(("xls", _)))
      .orElse(decodeLegacyPpt(bytes).map(("ppt", _)))
      .orElse(decodeMsgDoc(bytes).map(("msg", _)))
      .getOrElse(("stub", stubDecode(bytes)))

  /** PDF routed through the media vocabulary: `media_kind` says "pdf"
    * and the feature vector is the extraction accounting (pages, lines,
    * chars) — exact integers, unlike the lossy-codec paths. The real
    * text lives behind [[graft.ops.Pdf.extractText]] (p113).
    */
  def decodePdfDoc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Pdf.extractText(bytes).map { pages =>
      val text = pages.mkString("\n")
      Array(pages.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** DOCX routed the same way: `media_kind` says "docx", features are
    * the extraction accounting (paragraphs, lines, chars). The real
    * text lives behind [[graft.ops.Docx.extractText]] (p124).
    */
  def decodeDocxDoc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Docx.extractText(bytes).map { paras =>
      val text = paras.mkString("\n")
      Array(paras.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** PPTX routed the same way: `media_kind` says "pptx", features are
    * the extraction accounting (slides, lines, chars). The real text
    * lives behind [[graft.ops.Pptx.extractText]] (p131).
    */
  def decodePptxDoc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Pptx.extractText(bytes).map { slides =>
      val text = slides.mkString("\n")
      Array(slides.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** XLSX routed the same way: `media_kind` says "xlsx", features are
    * the extraction accounting (sheets, lines, chars) — see
    * [[graft.ops.Xlsx.extractText]] (p132).
    */
  def decodeXlsxDoc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Xlsx.extractText(bytes).map { sheets =>
      val text = sheets.mkString("\n")
      Array(sheets.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** RTF routed the same way: `media_kind` says "rtf", features are
    * the extraction accounting (paragraphs, lines, chars). The real
    * text lives behind [[graft.ops.Rtf.extractText]] (p140). The
    * `{\rtf` magic is checked inside the extractor, so arbitrary
    * brace-prefixed text cannot catch the label.
    */
  def decodeRtfDoc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Rtf.extractText(bytes).map { paras =>
      val text = paras.mkString("\n")
      Array(paras.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** Legacy Word .doc routed the same way: `media_kind` says "doc",
    * features are the extraction accounting (paragraphs, lines, chars).
    * The real text lives behind [[graft.ops.Doc.extractText]] (p143);
    * the OLE2 magic plus a WordDocument stream are checked inside it,
    * so other compound files (.xls, .msg) stay "stub" rather than
    * mislabeling.
    */
  def decodeLegacyDoc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Doc.extractText(bytes).map { paras =>
      val text = paras.mkString("\n")
      Array(paras.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** Legacy Excel .xls routed the same way: `media_kind` says "xls",
    * features are the extraction accounting (sheets, lines, chars) —
    * see [[graft.ops.Xls.extractText]] (p144).
    */
  def decodeLegacyXls(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Xls.extractText(bytes).map { sheets =>
      val text = sheets.mkString("\n")
      Array(sheets.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** Legacy PowerPoint .ppt routed the same way: `media_kind` says
    * "ppt", features are the extraction accounting (slides, lines,
    * chars) — see [[graft.ops.Ppt.extractText]] (p145).
    */
  def decodeLegacyPpt(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Ppt.extractText(bytes).map { slides =>
      val text = slides.mkString("\n")
      Array(slides.size.toFloat, (1 + text.count(_ == '\n')).toFloat,
        text.length.toFloat)
    }

  /** Outlook .msg routed the same way: `media_kind` says "msg",
    * features are (subject chars, body lines, body chars) — see
    * [[graft.ops.Msg.extractMail]] (p146).
    */
  def decodeMsgDoc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Msg.extractMail(bytes).map { m =>
      Array(m.subject.length.toFloat,
        (1 + m.body.count(_ == '\n')).toFloat, m.body.length.toFloat)
    }

  /** MP3 routed through the media vocabulary: `media_kind` says "mp3",
    * features are the frame-grammar inventory (frames, samplerate,
    * min/max kbps, duration seconds) — the [[graft.ops.Mp3]] catalog
    * pass (p106). Requires ≥2 chained complete frames so arbitrary
    * binary that happens to start with one sync-shaped header stays
    * "stub" (two consecutive frame-length-consistent headers do not
    * occur by accident).
    */
  def decodeMp3Doc(bytes: Array[Byte]): Option[Array[Float]] =
    graft.ops.Mp3.parse(bytes).filter(_.nFrames >= 2).map { inv =>
      Array(inv.nFrames.toFloat, inv.sampleRateHz.toFloat,
        inv.brMinKbps.toFloat, inv.brMaxKbps.toFloat,
        inv.durationUs / 1e6f)
    }

  /** Deterministic 16-bit mono PCM WAV fixture: a seed-keyed sine (RIFF
    * header hand-written — byte-stable across JDKs, unlike re-encoding).
    */
  def syntheticWav(seed: Long, nSamples: Int = 4410,
                   sampleRate: Int = 44100): Array[Byte] = {
    val pcm = sineSamples(seed, nSamples, sampleRate) // 200..2150 Hz by seed
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = pcm(i)
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + data.length); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1); out.putShort(1)                       // PCM, mono
    out.putInt(sampleRate); out.putInt(sampleRate * 2)     // byte rate
    out.putShort(2); out.putShort(16)                      // block align, bits
    out.put("data".getBytes); out.putInt(data.length); out.put(data)
    out.array()
  }

  /** The [[syntheticWav]] sine as ints — shared by both fixture encoders
    * so WAV and FLAC carry the SAME samples (lossless compression of one
    * signal → one feature vector → one oracle).
    */
  private[graft] def sineSamples(seed: Long, nSamples: Int = 4410,
                                 sampleRate: Int = 44100): Array[Int] = {
    val freq = 200.0 + (seed % 40) * 50.0
    val amp = 0.5
    Array.tabulate(nSamples)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt)
  }

  /** Deterministic FLAC fixture: the [[syntheticWav]] sine, losslessly
    * FLAC-encoded by the native [[Flac]] encoder (per-frame subframe
    * strategy cycles VERBATIM/FIXED/LPC so the fixture exercises every
    * decoder path). Decoding yields exactly the WAV samples — same
    * features, same oracle literals.
    */
  def syntheticFlac(seed: Long, nSamples: Int = 4410,
                    sampleRate: Int = 44100): Array[Byte] =
    Flac.encode(Array(sineSamples(seed, nSamples, sampleRate)), sampleRate)

  /** Deterministic companded / ADPCM WAV fixtures: the SAME sine as
    * [[syntheticWav]], encoded through the native [[G711]] / [[ImaAdpcm]]
    * codecs into a hand-written RIFF container (fmt tag 7 = μ-law, 6 =
    * A-law, 0x11 = IMA ADPCM; 18/20-byte fmt chunk with cbSize, plus the
    * `fact` chunk non-PCM WAV requires). Unlike FLAC these are LOSSY, so
    * the expected features are NOT p39's — the p73 oracle literals are
    * re-derived by the independent Python codec mirror in
    * tools/gen_multimodal_oracle.py (encode→decode→DSP, no shared code).
    */
  def syntheticCompandedWav(seed: Long, codec: String, nSamples: Int = 4410,
                            sampleRate: Int = 44100): Array[Byte] = {
    val pcm = sineSamples(seed, nSamples, sampleRate)
    codec match {
      case "ulaw" | "alaw" =>
        val data = new Array[Byte](nSamples)
        var i = 0
        while (i < nSamples) {
          data(i) = if (codec == "ulaw") G711.linearToUlaw(pcm(i).toShort)
                    else G711.linearToAlaw(pcm(i).toShort)
          i += 1
        }
        val fmtTag = if (codec == "ulaw") 7 else 6
        val out = java.nio.ByteBuffer.allocate(12 + 26 + 12 + 8 + data.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        // RIFF size = everything after the size field itself:
        // WAVE(4) + fmt(26) + fact(12) + data header(8) + payload
        out.put("RIFF".getBytes); out.putInt(4 + 26 + 12 + 8 + data.length)
        out.put("WAVE".getBytes)
        out.put("fmt ".getBytes); out.putInt(18)
        out.putShort(fmtTag.toShort); out.putShort(1)    // mono
        out.putInt(sampleRate); out.putInt(sampleRate)   // 1 byte/sample
        out.putShort(1); out.putShort(8)                 // block align, bits
        out.putShort(0)                                  // cbSize
        out.put("fact".getBytes); out.putInt(4); out.putInt(nSamples)
        out.put("data".getBytes); out.putInt(data.length); out.put(data)
        out.array()
      case "adpcm" =>
        val blockAlign = 256
        val data = ImaAdpcm.encode(pcm, blockAlign)
        val spb = ImaAdpcm.samplesPerBlock(blockAlign)
        val out = java.nio.ByteBuffer.allocate(12 + 28 + 12 + 8 + data.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        // WAVE(4) + fmt(28) + fact(12) + data header(8) + payload
        out.put("RIFF".getBytes); out.putInt(4 + 28 + 12 + 8 + data.length)
        out.put("WAVE".getBytes)
        out.put("fmt ".getBytes); out.putInt(20)
        out.putShort(0x11); out.putShort(1)              // IMA ADPCM, mono
        out.putInt(sampleRate)
        out.putInt(sampleRate * blockAlign / spb)        // avg byte rate
        out.putShort(blockAlign.toShort); out.putShort(4) // bits/sample
        out.putShort(2); out.putShort(spb.toShort)       // cbSize, samples/block
        out.put("fact".getBytes); out.putInt(4); out.putInt(nSamples)
        out.put("data".getBytes); out.putInt(data.length); out.put(data)
        out.array()
      case other => throw new IllegalArgumentException(s"codec: $other")
    }
  }

  /** Deterministic uncompressed-AVI fixture: 6-9 frames (seed-keyed) of
    * fmix64-hashed pixels (the [[syntheticPng]] mixer with a frame term)
    * in a hand-written RIFF 'AVI ' container — LIST hdrl (avih + one
    * 'vids'/'DIB ' strl), LIST movi of '00db' BI_RGB 24-bit bottom-up
    * frames (rows padded to 4 bytes; w = 15 deliberately exercises the
    * pad), and the idx1 keyframe index AVI 1.0 players require. Fully
    * integer-exact, so the Python mirror re-derives the decoded features
    * with no shared code.
    */
  def syntheticAvi(seed: Long, w: Int = 15, h: Int = 10): Array[Byte] = {
    // 40-seed period, folded HERE like sineSamples' freq — so the oracle's
    // `doc_id % 40 = seed` join sees one video per residue, not per id
    val k = seed % 40
    val nFrames = (6 + k % 4).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val frameSize = stride * h
    def mix(v: Long): Long = {
      var z = v
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    val moviPayload = 4 + nFrames * (8 + frameSize) // frameSize is even
    val idx1Payload = nFrames * 16
    val hdrlTotal = 8 + 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffPayload = 4 + hdrlTotal + (8 + moviPayload) + (8 + idx1Payload)
    val out = java.nio.ByteBuffer.allocate(8 + riffPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(riffPayload); out.put("AVI ".getBytes)
    out.put("LIST".getBytes); out.putInt(hdrlTotal - 8); out.put("hdrl".getBytes)
    out.put("avih".getBytes); out.putInt(56)
    out.putInt(40000); out.putInt(frameSize * 25); out.putInt(0)
    out.putInt(0x10)                                  // AVIF_HASINDEX
    out.putInt(nFrames); out.putInt(0); out.putInt(1) // frames, initial, streams
    out.putInt(frameSize); out.putInt(w); out.putInt(h)
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    out.put("LIST".getBytes); out.putInt(4 + (8 + 56) + (8 + 40))
    out.put("strl".getBytes)
    out.put("strh".getBytes); out.putInt(56)
    out.put("vids".getBytes); out.put("DIB ".getBytes)
    out.putInt(0); out.putShort(0); out.putShort(0); out.putInt(0)
    out.putInt(1); out.putInt(25)                     // scale, rate → 25 fps
    out.putInt(0); out.putInt(nFrames); out.putInt(frameSize)
    out.putInt(-1); out.putInt(0)                     // quality, sampleSize
    out.putShort(0); out.putShort(0)                  // rcFrame
    out.putShort(w.toShort); out.putShort(h.toShort)
    out.put("strf".getBytes); out.putInt(40)
    out.putInt(40); out.putInt(w); out.putInt(h)      // BITMAPINFOHEADER
    out.putShort(1); out.putShort(24)                 // planes, bits
    out.putInt(0); out.putInt(frameSize)              // BI_RGB, image size
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    out.put("LIST".getBytes); out.putInt(moviPayload); out.put("movi".getBytes)
    var f = 0
    while (f < nFrames) {
      out.put("00db".getBytes); out.putInt(frameSize)
      var row = 0
      while (row < h) {
        val y = h - 1 - row // DIB rows are stored bottom-up
        var x = 0
        while (x < w) {
          val p = mix(k * 1000003L + f * 7919L + y * 1009L + x)
          val rgb = (p & 0xffffff).toInt
          out.put((rgb & 0xff).toByte)         // B
          out.put(((rgb >> 8) & 0xff).toByte)  // G
          out.put(((rgb >> 16) & 0xff).toByte) // R
          x += 1
        }
        var pad = w * 3
        while (pad < stride) { out.put(0.toByte); pad += 1 }
        row += 1
      }
      f += 1
    }
    out.put("idx1".getBytes); out.putInt(idx1Payload)
    f = 0
    while (f < nFrames) {
      out.put("00db".getBytes); out.putInt(0x10)      // AVIIF_KEYFRAME
      out.putInt(4 + f * (8 + frameSize)); out.putInt(frameSize)
      f += 1
    }
    out.array()
  }

  /** Real COMPRESSED video decode: BI_RLE8 AVI — Microsoft RLE, the
    * palettized run-length codec of the Windows BMP/AVI spec (biCompression
    * = 1). Unlike the raw-DIB path this is TEMPORAL compression: pixels a
    * P-frame leaves untouched (end-of-line, delta skips, early end-of-
    * bitmap) keep the previous frame's content, so the decoder carries a
    * persistent index framebuffer across frames and reconstructs each
    * frame before pooling. Byte-exact integer output → meets the
    * hash-equality oracle, which float-DCT codecs never could.
    *
    * Opcode grammar decoded (full spec): (n>0, idx) encoded run; 00 00
    * end-of-line; 00 01 end-of-bitmap; 00 02 dx dy position delta (the
    * inter-frame skip); 00 n>=3 absolute run, word-aligned.
    *
    * Feature contract identical to [[decodeAviVideo]] (indices 0-7), with
    * RGB resolved through the stream's declared palette.
    */
  def decodeRle8Video(bytes: Array[Byte]): Option[Array[Float]] =
    walkAvi(bytes).flatMap { raw =>
      if (raw.bitCount != 8 || raw.compression != 1 || raw.palette.isEmpty)
        return None
      import raw.{w, h}
      val nF = raw.frameOff.length
      val cur = new Array[Byte](w * h) // bottom-up row-major, index 0 initial
      var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
      val quarterLuma = new Array[Double](4)
      val quarterN = new Array[Long](4)
      var f = 0
      while (f < nF) {
        if (!rle8Frame(bytes, raw.frameOff(f), raw.frameOff(f) + raw.frameLen(f),
          cur, w, h)) return None
        val q = math.min(3, f * 4 / nF)
        var i = 0
        while (i < w * h) {
          val idx = cur(i) & 0xff
          if (idx >= raw.palette.length) return None
          val rgb = raw.palette(idx)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sumR += r; sumG += g; sumB += b
          quarterLuma(q) += 0.299 * r + 0.587 * g + 0.114 * b
          quarterN(q) += 1
          i += 1
        }
        f += 1
      }
      val n = nF.toDouble * w * h
      val out = new Array[Float](FeatureDim)
      out(0) = (sumR / n / 255.0).toFloat
      out(1) = (sumG / n / 255.0).toFloat
      out(2) = (sumB / n / 255.0).toFloat
      out(3) = ((0.299 * sumR + 0.587 * sumG + 0.114 * sumB) / n / 255.0).toFloat
      var q = 0
      while (q < 4) {
        out(4 + q) =
          if (quarterN(q) == 0) 0f
          else (quarterLuma(q) / quarterN(q) / 255.0).toFloat
        q += 1
      }
      Some(out)
    }

  /** Decode one RLE8 frame chunk into `buf` (bottom-up row-major indices),
    * leaving skipped pixels untouched (temporal prediction). False on any
    * out-of-bounds write or truncated opcode — corrupt frames must not
    * read garbage.
    */
  private[graft] def rle8Frame(bytes: Array[Byte], start: Int, end: Int,
                               buf: Array[Byte], w: Int, h: Int): Boolean = {
    var x = 0; var row = 0; var p = start
    while (p + 2 <= end) {
      val b0 = bytes(p) & 0xff; val b1 = bytes(p + 1) & 0xff; p += 2
      if (b0 > 0) {
        if (row >= h || x + b0 > w) return false
        java.util.Arrays.fill(buf, row * w + x, row * w + x + b0, b1.toByte)
        x += b0
      } else b1 match {
        case 0 => x = 0; row += 1; if (row > h) return false
        case 1 => return true // end of bitmap; rest stays predicted
        case 2 =>
          if (p + 2 > end) return false
          x += bytes(p) & 0xff; row += bytes(p + 1) & 0xff; p += 2
          if (x > w || row > h) return false
        case nAbs =>
          if (row >= h || x + nAbs > w || p + nAbs > end) return false
          System.arraycopy(bytes, p, buf, row * w + x, nAbs)
          p += nAbs + (nAbs & 1) // absolute runs are word-aligned
          x += nAbs
      }
    }
    true // implicit end-of-bitmap at chunk end
  }

  /** Deterministic BI_RLE8 AVI fixture: a static per-row background with a
    * moving 4×3 rectangle, palettized to 64 seed-keyed colors. Frame 0 is
    * a keyframe (every pixel coded); each following frame is a true
    * P-frame — the encoder diffs against the reconstructed previous frame
    * and emits position deltas / end-of-lines for unchanged spans, encoded
    * runs for homogeneous changed spans, and absolute mode for
    * heterogeneous ones, so every opcode of the codec is exercised by the
    * fixture itself. Integer-exact content (fmix64 palette, integer rect
    * walk) → the Python mirror re-derives the decoded features with no
    * shared code, and n_bytes comes from this writer like [[aviBytes]].
    */
  def syntheticRleAvi(seed: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
    val k = (seed % 40).toInt // 40-seed period, like syntheticAvi
    val nFrames = 5 + k % 4
    val nColors = 64
    def mix(v: Long): Long = {
      var z = v
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    // logical content in TOP-DOWN coords; buffers stored bottom-up
    def frameIndices(f: Int): Array[Byte] = {
      val rx = (k + 3 * f) % (w - 4); val ry = (k / 7 + 2 * f) % (h - 3)
      val buf = new Array[Byte](w * h)
      var row = 0
      while (row < h) {
        val y = h - 1 - row
        var x = 0
        while (x < w) {
          val inRect = x >= rx && x < rx + 4 && y >= ry && y < ry + 3
          val idx = if (inRect) (k + f + x + y) % nColors else (k * 5 + y) % nColors
          buf(row * w + x) = idx.toByte
          x += 1
        }
        row += 1
      }
      buf
    }
    def encodeFrame(cur: Array[Byte], prev: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(w * h / 2)
      def same(row: Int, x: Int) =
        prev != null && prev(row * w + x) == cur(row * w + x)
      def rowUnchanged(row: Int): Boolean = {
        var x = 0
        while (x < w) { if (!same(row, x)) return false; x += 1 }
        prev != null
      }
      var row = 0
      while (row < h) {
        if (rowUnchanged(row)) {
          var run = 0
          while (row + run < h && rowUnchanged(row + run)) run += 1
          if (row + run >= h) row = h // trailing unchanged rows → EOB only
          else {
            if (run == 1) { out.write(0); out.write(0) } // EOL
            else { out.write(0); out.write(2); out.write(0); out.write(run) }
            row += run
          }
        } else {
          var x = 0
          while (x < w) {
            // unchanged prefix ≥3 → delta skip (1-2 re-code cheaper than 4B)
            var u = 0
            while (x + u < w && same(row, x + u)) u += 1
            if (x + u >= w && u > 0) x = w // rest unchanged → EOL covers it
            else if (u >= 3) {
              out.write(0); out.write(2); out.write(u); out.write(0); x += u
            } else {
              // changed span: up to the next ≥3-long unchanged run
              var e = x + u // u<3 pixels re-coded along with the span
              var done = false
              while (!done && e < w) {
                var u2 = 0
                while (e + u2 < w && same(row, e + u2)) u2 += 1
                if (u2 >= 3 || e + u2 >= w) done = true
                if (!done) e += u2 + 1
                else if (e + u2 >= w && u2 < 3) e = w
              }
              var i = x
              while (i < e) {
                var run = 1
                while (i + run < e && cur(row * w + i + run) == cur(row * w + i) &&
                  run < 255) run += 1
                if (run >= 2) {
                  out.write(run); out.write(cur(row * w + i) & 0xff); i += run
                } else {
                  var j = i + 1 // count singletons ahead
                  var r2 = 1
                  while (j < e && r2 < 2) {
                    r2 = 1
                    while (j + r2 < e && cur(row * w + j + r2) == cur(row * w + j) &&
                      r2 < 255) r2 += 1
                    if (r2 < 2) j += 1
                  }
                  val nSingle = j - i
                  if (nSingle >= 3) {
                    out.write(0); out.write(nSingle)
                    var t = i
                    while (t < j) { out.write(cur(row * w + t) & 0xff); t += 1 }
                    if ((nSingle & 1) != 0) out.write(0) // word align
                  } else {
                    var t = i
                    while (t < j) { out.write(1); out.write(cur(row * w + t) & 0xff); t += 1 }
                  }
                  i = j
                }
              }
              x = e
            }
          }
          row += 1
          if (row < h) { out.write(0); out.write(0) } // EOL
        }
      }
      out.write(0); out.write(1) // end of bitmap
      out.toByteArray
    }
    val frames = new Array[Array[Byte]](nFrames)
    var prev: Array[Byte] = null
    var f = 0
    while (f < nFrames) {
      val cur = frameIndices(f)
      frames(f) = encodeFrame(cur, prev)
      prev = cur
      f += 1
    }
    val framePadded = frames.map(fr => fr.length + (fr.length & 1))
    val moviPayload = 4 + frames.indices.map(8 + framePadded(_)).sum
    val idx1Payload = nFrames * 16
    val strfSize = 40 + nColors * 4
    val hdrlTotal = 8 + 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + strfSize))
    val riffPayload = 4 + hdrlTotal + (8 + moviPayload) + (8 + idx1Payload)
    val out = java.nio.ByteBuffer.allocate(8 + riffPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(riffPayload); out.put("AVI ".getBytes)
    out.put("LIST".getBytes); out.putInt(hdrlTotal - 8); out.put("hdrl".getBytes)
    out.put("avih".getBytes); out.putInt(56)
    out.putInt(40000); out.putInt(w * h * 25); out.putInt(0)
    out.putInt(0x10)                                  // AVIF_HASINDEX
    out.putInt(nFrames); out.putInt(0); out.putInt(1)
    out.putInt(w * h); out.putInt(w); out.putInt(h)
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    out.put("LIST".getBytes); out.putInt(4 + (8 + 56) + (8 + strfSize))
    out.put("strl".getBytes)
    out.put("strh".getBytes); out.putInt(56)
    out.put("vids".getBytes); out.put("MRLE".getBytes)
    out.putInt(0); out.putShort(0); out.putShort(0); out.putInt(0)
    out.putInt(1); out.putInt(25)
    out.putInt(0); out.putInt(nFrames); out.putInt(w * h)
    out.putInt(-1); out.putInt(0)
    out.putShort(0); out.putShort(0)
    out.putShort(w.toShort); out.putShort(h.toShort)
    out.put("strf".getBytes); out.putInt(strfSize)
    out.putInt(40); out.putInt(w); out.putInt(h)      // BITMAPINFOHEADER
    out.putShort(1); out.putShort(8)                  // planes, 8-bit
    out.putInt(1); out.putInt(w * h)                  // BI_RLE8
    out.putInt(0); out.putInt(0)
    out.putInt(nColors); out.putInt(0)                // biClrUsed
    var c = 0
    while (c < nColors) {                             // RGBQUAD: B,G,R,0
      val rgb = (mix(k * 31L + c) & 0xffffff).toInt
      out.put((rgb & 0xff).toByte); out.put(((rgb >> 8) & 0xff).toByte)
      out.put(((rgb >> 16) & 0xff).toByte); out.put(0.toByte)
      c += 1
    }
    out.put("LIST".getBytes); out.putInt(moviPayload); out.put("movi".getBytes)
    f = 0
    var dataOff = 4
    val offsets = new Array[Int](nFrames)
    while (f < nFrames) {
      offsets(f) = dataOff
      out.put("00dc".getBytes); out.putInt(frames(f).length)
      out.put(frames(f))
      if ((frames(f).length & 1) != 0) out.put(0.toByte)
      dataOff += 8 + framePadded(f)
      f += 1
    }
    out.put("idx1".getBytes); out.putInt(idx1Payload)
    f = 0
    while (f < nFrames) {
      out.put("00dc".getBytes)
      out.putInt(if (f == 0) 0x10 else 0)             // only frame 0 is a keyframe
      out.putInt(offsets(f)); out.putInt(frames(f).length)
      f += 1
    }
    out.array()
  }

  /** 'MJPG' as the little-endian fourcc int a BITMAPINFOHEADER carries. */
  private[graft] final val FourccMjpg: Int =
    'M' | ('J' << 8) | ('P' << 16) | ('G' << 24)

  /** Real DCT-compressed video decode: MJPEG AVI — each '00dc' chunk is a
    * complete baseline-JPEG image (the intra-only codec surveillance,
    * robotics and capture-card corpora actually ship), decoded by the
    * JDK's real ImageIO JPEG codec inside the same native RIFF walk as
    * the other AVI flavors. This is genuine DCT video: quantized
    * frequency-domain coefficients, chroma subsampling, Huffman entropy
    * coding — which is exactly why its contract differs from the
    * integer-exact codecs: decoded pixels carry quantization error, so
    * correctness is gated cross-codec (features within a small L∞ bound
    * of the losslessly-coded twin of the same frames; see p82/AviSpec),
    * never by hash equality.
    *
    * Feature contract identical to [[decodeAviVideo]] (indices 0-7).
    * None when the fourcc isn't MJPG, any frame fails to decode, or a
    * frame's geometry contradicts the stream header — corrupt archives
    * degrade to the stub, not to garbage features.
    */
  def decodeMjpegVideo(bytes: Array[Byte]): Option[Array[Float]] =
    walkAvi(bytes).flatMap { raw =>
      if (raw.compression != FourccMjpg || raw.bitCount != 24) return None
      import raw.{w, h}
      val nF = raw.frameOff.length
      var sumR = 0.0; var sumG = 0.0; var sumB = 0.0
      val quarterLuma = new Array[Double](4)
      val quarterN = new Array[Long](4)
      var f = 0
      while (f < nF) {
        // Exception, not just IOException (house style, decodeImage:38):
        // ImageIO's JPEG plugin surfaces some malformed bitstreams as
        // runtime exceptions, and a corrupt blob must degrade to None
        // (→ stub features), never kill a task
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
            bytes, raw.frameOff(f), raw.frameLen(f)))
          catch { case _: Exception => null }
        if (img == null || img.getWidth != w || img.getHeight != h)
          return None
        val q = math.min(3, f * 4 / nF)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sumR += r; sumG += g; sumB += b
            quarterLuma(q) += 0.299 * r + 0.587 * g + 0.114 * b
            quarterN(q) += 1
            x += 1
          }
          y += 1
        }
        f += 1
      }
      val n = nF.toDouble * w * h
      val out = new Array[Float](FeatureDim)
      out(0) = (sumR / n / 255.0).toFloat
      out(1) = (sumG / n / 255.0).toFloat
      out(2) = (sumB / n / 255.0).toFloat
      out(3) = ((0.299 * sumR + 0.587 * sumG + 0.114 * sumB) / n / 255.0).toFloat
      var q = 0
      while (q < 4) {
        out(4 + q) =
          if (quarterN(q) == 0) 0f
          else (quarterLuma(q) / quarterN(q) / 255.0).toFloat
        q += 1
      }
      Some(out)
    }

  /** One baseline-JPEG encode through the JDK writer at an explicit
    * quality — the fixture side of the MJPEG path (per-frame, so the AVI
    * is bona-fide motion JPEG, not one image reused).
    */
  private[graft] def encodeJpeg(img: java.awt.image.BufferedImage,
                         quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic MJPEG AVI fixture: the SAME fmix64 formula frames as
    * [[syntheticAvi]] (same seed period, frame count, geometry and pixel
    * values), each frame run through the real JDK JPEG encoder and packed
    * into a RIFF 'AVI ' container with the 'MJPG' fourcc and variable-size
    * word-aligned '00dc' chunks. Because the pixels are identical,
    * [[syntheticAvi]]'s lossless decode is this fixture's ground truth:
    * `|features(mjpeg) - features(dib)|_∞` is pure JPEG quantization
    * error, bounded far under the 0.02 gate at quality 0.9.
    */
  def syntheticMjpegAvi(seed: Long, w: Int = 15, h: Int = 10): Array[Byte] = {
    val k = seed % 40
    val nFrames = (6 + k % 4).toInt
    def mix(v: Long): Long = {
      var z = v
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    val frames: Array[Array[Byte]] = Array.tabulate(nFrames) { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = mix(k * 1000003L + f * 7919L + y * 1009L + x)
          img.setRGB(x, y, 0xff000000 | (p & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      encodeJpeg(img, 0.9f)
    }
    def framePadded(f: Int) = frames(f).length + (frames(f).length & 1)
    val maxFrame = frames.map(_.length).max
    val moviPayload = 4 + frames.indices.map(8 + framePadded(_)).sum
    val idx1Payload = nFrames * 16
    val hdrlTotal = 8 + 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffPayload = 4 + hdrlTotal + (8 + moviPayload) + (8 + idx1Payload)
    val out = java.nio.ByteBuffer.allocate(8 + riffPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(riffPayload); out.put("AVI ".getBytes)
    out.put("LIST".getBytes); out.putInt(hdrlTotal - 8); out.put("hdrl".getBytes)
    out.put("avih".getBytes); out.putInt(56)
    out.putInt(40000); out.putInt(maxFrame * 25); out.putInt(0)
    out.putInt(0x10)                                  // AVIF_HASINDEX
    out.putInt(nFrames); out.putInt(0); out.putInt(1)
    out.putInt(maxFrame); out.putInt(w); out.putInt(h)
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    out.put("LIST".getBytes); out.putInt(4 + (8 + 56) + (8 + 40))
    out.put("strl".getBytes)
    out.put("strh".getBytes); out.putInt(56)
    out.put("vids".getBytes); out.put("MJPG".getBytes)
    out.putInt(0); out.putShort(0); out.putShort(0); out.putInt(0)
    out.putInt(1); out.putInt(25)                     // scale, rate → 25 fps
    out.putInt(0); out.putInt(nFrames); out.putInt(maxFrame)
    out.putInt(-1); out.putInt(0)
    out.putShort(0); out.putShort(0)
    out.putShort(w.toShort); out.putShort(h.toShort)
    out.put("strf".getBytes); out.putInt(40)
    out.putInt(40); out.putInt(w); out.putInt(h)      // BITMAPINFOHEADER
    out.putShort(1); out.putShort(24)                 // planes, bits
    out.putInt(FourccMjpg); out.putInt(maxFrame)      // biCompression MJPG
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0)
    out.put("LIST".getBytes); out.putInt(moviPayload); out.put("movi".getBytes)
    var f = 0
    var dataOff = 4
    val offsets = new Array[Int](nFrames)
    while (f < nFrames) {
      offsets(f) = dataOff
      out.put("00dc".getBytes); out.putInt(frames(f).length)
      out.put(frames(f))
      if ((frames(f).length & 1) != 0) out.put(0.toByte)
      dataOff += 8 + framePadded(f)
      f += 1
    }
    out.put("idx1".getBytes); out.putInt(idx1Payload)
    f = 0
    while (f < nFrames) {
      out.put("00dc".getBytes); out.putInt(0x10)      // MJPEG: all keyframes
      out.putInt(offsets(f)); out.putInt(frames(f).length)
      f += 1
    }
    out.array()
  }

  /** STUB for media nothing here can decode (psychoacoustic audio,
    * inter-predicted DCT video): deterministic fixed-shape "features"
    * derived from
    * the raw bytes. Kept ONLY as the last fallback; images take the real
    * [[decodeImage]] path, PCM containers the real [[decodeAudio]] path,
    * COMPRESSED audio the native from-scratch [[Flac]] decoder,
    * companded/ADPCM audio the native [[G711]]/[[ImaAdpcm]] codecs,
    * uncompressed AVI the native [[decodeAviVideo]] container walk, and
    * intra-only DCT video the real [[decodeMjpegVideo]] JPEG path — so
    * the stub's remaining territory is genuinely undecodable-here media.
    *
    * Closure note on the rest (MP3/Vorbis/AAC/H.264): a pure-JVM decoder
    * (e.g. the public JLayer/jorbis libraries) would slot in behind
    * [[decode]]'s dispatch with zero Spark-side change, but this build
    * environment resolves dependencies offline from a fixed cache that
    * carries none of them, and the JDK's `javax.sound` SPI ships no
    * compressed-format providers on a headless install — verified:
    * `AudioSystem.getAudioFileTypes` lists only WAVE/AU/AIFF here.
    * From-scratch is also off the table for a different reason than
    * effort: these codecs' conformance hinges on NORMATIVE TABULATED
    * DATA (MPEG audio's 512-coefficient synthesis window and bit-
    * allocation tables, AAC/H.264 Huffman/CAVLC codebooks) that is spec
    * data, not derivable math — FLAC, G.711, ADPCM, RLE8 and JPEG-
    * via-ImageIO were implementable exactly because their pipelines are
    * closed-form (or the JDK ships the codec); MJPEG closed the last
    * spec-derivable codec class. Psychoacoustic codecs are additionally
    * not integer-exact (float filterbanks with spec-permitted
    * tolerance), so they could never meet the hash-equality oracle
    * contract the deterministic formats — including the LOSSY-but-
    * integer G.711 and IMA ADPCM paths (p73) — do; the p82-style
    * cross-codec bound would be the right gate if a decoder ever lands.
    */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, bytes.length / FeatureDim)
    var j = 0
    while (j < FeatureDim) { out(j) /= n; j += 1 }
    out
  }

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** (id, media BINARY) → (id, format, n_bytes, checksum, features ARRAY<FLOAT>).
    * One decoder per partition (codec init amortized per partition, not per
    * row); image bytes decode for real via ImageIO, anything else falls back
    * to the stub.
    */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String,
                      format: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", LongType),
      StructField("features", ArrayType(FloatType))))
    val rdd = df.select(col(idCol).cast("long"), col(mediaCol)).rdd.mapPartitions { it =>
      // ImageIO plugin lookup is per-JVM; disk caching off keeps executor
      // threads from contending on a shared scratch file
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, format, if (bytes == null) 0L else bytes.length.toLong,
          if (bytes == null) 0L else fnv64(bytes), decode(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Deterministic tiny RGB PNG, seeded — the media-column fixture generator
    * (the role OsmPbfWriter plays for PBF): a w×h gradient keyed by `seed`
    * so every row's image, and therefore its decoded features, is stable.
    */
  def syntheticPng(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // proper per-pixel hash mixing (fmix64 finalizer), not a linear
    // gradient: linear patterns binarize identically under perceptual
    // hashing, which made distinct seeds collide at Hamming 0
    def mix(v: Long): Long = {
      var z = v
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = mix(seed * 1000003L + y * 1009L + x)
        img.setRGB(x, y, (p & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** (id) → (id, media BINARY): attach a deterministic synthetic PNG per
    * row, partition-local (no shuffle) — gives pipelines real image bytes to
    * decode where no real media column exists.
    */
  def synthesizeImages(df: DataFrame, idCol: String, w: Int = 8, h: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType)))
    val rdd = df.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticPng(id, w, h))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Real image resize: JDK Graphics2D bilinear scale, PNG re-encode. The
    * standard normalize-before-featurize step; None when undecodable.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (bytes == null) return None
    val src =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (src == null) return None
    val dst = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", out)
    Some(out.toByteArray)
  }

  /** Perceptual average hash (aHash): decode, bilinear-resize to 8×8, gray
    * via luma, one bit per pixel (luma > mean), MSB-first row-major — the
    * cheap perceptual fingerprint whose Hamming distance survives resizing
    * and mild recompression. None when the bytes are not an image.
    */
  def aHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val dst = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
    } finally g.dispose()
    val luma = new Array[Double](64)
    var mean = 0.0
    var i = 0
    while (i < 64) {
      val rgb = dst.getRGB(i % 8, i / 8)
      luma(i) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      mean += luma(i)
      i += 1
    }
    mean /= 64.0
    var hash = 0L
    i = 0
    while (i < 64) { if (luma(i) > mean) hash |= (1L << (63 - i)); i += 1 }
    Some(hash)
  }

  /** (id, media) → (id, phash LONG): partition-wise perceptual hashing
    * (decoder setup amortized like [[extractFeatures]]); non-images drop.
    */
  def perceptualHashes(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("phash", LongType)))
    val rdd = df.select(col(idCol).cast("long"), col(mediaCol)).rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        aHash(r.getAs[Array[Byte]](1)).map(h => Row(r.getLong(0), h))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Image near-dup pairs by perceptual hash: LSH-candidates-then-verify,
    * the same shape as the text MinHash pipeline (what holds at 100 TB of
    * images). See [[nearDupPairsFromHashes]] for the recall guarantee.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
                        maxHamming: Int): DataFrame =
    nearDupPairsFromHashes(perceptualHashes(df, idCol, mediaCol), maxHamming)

  /** Near-dup pairs over a (id, phash LONG) frame. The 64-bit hash splits
    * into equal bands; by pigeonhole a pair within Hamming distance d shares
    * at least one exact band iff the band count exceeds d (d differing bits
    * can spoil at most d bands). So the band count is DERIVED from
    * `maxHamming` — the smallest power-of-two divisor of 64 that is
    * strictly greater than it — and candidates come from a BUCKET join on
    * (band, key), never an all-pairs product, with the exact
    * `bit_count(xor)` filter on candidates only. maxHamming ≥ 32 would need
    * 64 one-bit bands (an all-pairs join in disguise) and is rejected.
    */
  def nearDupPairsFromHashes(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming must be in [0, 32): $maxHamming")
    val nBands = Seq(1, 2, 4, 8, 16, 32).find(_ > maxHamming).get
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bands = hashes.select(col("id"), col("phash"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("key", expr(s"shiftright(phash, band * $width) & $mask"))
    val l = bands.select(col("band"), col("key"),
      col("id").as("a"), col("phash").as("ha"))
    val r = bands.select(col("band"), col("key"),
      col("id").as("b"), col("phash").as("hb"))
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** REAL keyframe extraction: walk each AVI's container ([[parseAvi]]),
    * take every k-th frame, and re-wrap it as a standalone BMP (14-byte
    * BITMAPFILEHEADER + the same BITMAPINFOHEADER + the DIB rows verbatim
    * — zero re-encoding, byte-deterministic) so each emitted frame is
    * directly decodable by the real [[decodeImage]] path downstream.
    * Explode-shape like [[sampleFrames]]: one input row → many frame rows,
    * partition-local, no shuffle. Non-AVI rows drop.
    */
  def aviKeyframes(df: DataFrame, idCol: String, mediaCol: String,
                   everyK: Int = 1): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val rdd = df.select(col(idCol).cast("long"), col(mediaCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        parseAvi(bytes).iterator.flatMap { avi =>
          val frameSize = avi.stride * avi.h
          (0 until avi.frames.length by everyK).iterator.map { f =>
            val bmp = java.nio.ByteBuffer.allocate(54 + frameSize)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bmp.put('B'.toByte); bmp.put('M'.toByte)
            bmp.putInt(54 + frameSize); bmp.putInt(0); bmp.putInt(54)
            bmp.putInt(40); bmp.putInt(avi.w); bmp.putInt(avi.h)
            bmp.putShort(1); bmp.putShort(24)
            bmp.putInt(0); bmp.putInt(frameSize)
            bmp.putInt(0); bmp.putInt(0); bmp.putInt(0); bmp.putInt(0)
            bmp.put(bytes, avi.frames(f), frameSize)
            Row(id, f, bmp.array())
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Video" frame sampling over an opaque blob: emit every k-th fixed-size
    * chunk as a frame row (id, frame_idx, frame BINARY). The chunking stands
    * in for keyframe extraction ([[aviKeyframes]] is the REAL path for
    * decodable containers); the explode-shape (one input row → many
    * frame rows, no shuffle) is the real contract.
    */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
                   frameBytes: Int, everyK: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val rdd = df.select(col(idCol).cast("long"), col(mediaCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else {
          val nChunks = bytes.length / frameBytes
          (0 until nChunks by everyK).iterator.map { c =>
            Row(id, c, java.util.Arrays.copyOfRange(bytes, c * frameBytes, (c + 1) * frameBytes))
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
