package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("feature extraction: fixed shape, deterministic, null-safe") {
    val df = Seq(
      (1L, "hello world".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val out = Multimodal.extractFeatures(df, "id", "media", "test")
      .orderBy($"id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_bytes") == 11L)
    assert(out(0).getAs[scala.collection.Seq[Float]]("features").length == Multimodal.FeatureDim)
    assert(out(1).getAs[Long]("n_bytes") == 0L)
    assert(out(2).getAs[Long]("n_bytes") == 0L && out(2).getAs[Long]("checksum") == 0L)
    // determinism
    val again = Multimodal.extractFeatures(df, "id", "media", "test")
      .orderBy($"id").collect()
    assert(out.zip(again).forall { case (a, b) => a == b })
  }

  test("real image decode: 2x2 PNG pools to exact channel and quadrant means") {
    // red | green / blue | white — luma coefficients sum to 1, so every
    // expected value is hand-checkable
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = Multimodal.decodeImage(out.toByteArray).get
    def ~=(a: Float, b: Double) = math.abs(a - b) < 1e-6
    assert(~=(f(0), 0.5) && ~=(f(1), 0.5) && ~=(f(2), 0.5), s"channel means: ${f.toSeq}")
    assert(~=(f(3), 0.5), s"mean luma: ${f(3)}")
    assert(~=(f(4), 0.299) && ~=(f(5), 0.587) && ~=(f(6), 0.114) && ~=(f(7), 1.0),
      s"quadrant lumas: ${f.toSeq}")
    // non-image bytes refuse to decode and fall back to the stub
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decode("not an image".getBytes).length == Multimodal.FeatureDim)
  }

  test("synthetic PNG fixtures: deterministic, decodable, distinct per seed") {
    val a1 = Multimodal.syntheticPng(1L); val a2 = Multimodal.syntheticPng(1L)
    val b = Multimodal.syntheticPng(2L)
    assert(a1.sameElements(a2), "same seed, same bytes")
    assert(!a1.sameElements(b), "different seed, different image")
    val fa = Multimodal.decodeImage(a1).get
    val fb = Multimodal.decodeImage(b).get
    assert(!fa.sameElements(fb), "features distinguish the images")
    // end-to-end through the Spark pipeline: real pixels, not the stub
    val df = spark.range(3).toDF("doc_id")
    val feats = Multimodal.extractFeatures(
      Multimodal.synthesizeImages(df, "doc_id"), "id", "media", "image/png")
      .orderBy($"id").collect()
    assert(feats.length == 3)
    assert(feats(1).getAs[scala.collection.Seq[Float]]("features").toArray
      .sameElements(Multimodal.decodeImage(Multimodal.syntheticPng(1L)).get))
  }

  test("frame sampling: every k-th fixed-size chunk, no shuffle shape") {
    val media = Array.tabulate(100)(_.toByte)
    val df = Seq((7L, media)).toDF("id", "media")
    val frames = Multimodal.sampleFrames(df, "id", "media", frameBytes = 10, everyK = 3)
      .orderBy($"frame_idx").collect()
    // chunks 0..9 (10 full), sampled 0,3,6,9
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 10))
    assert(frames(1).getAs[Array[Byte]]("frame").head == 30.toByte)
  }

  test("resize: target dims, still decodable, constant image stays constant") {
    val png = Multimodal.syntheticPng(7, w = 16, h = 16)
    val small = Multimodal.resizeImage(png, 4, 4).get
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    assert(img.getWidth == 4 && img.getHeight == 4)
    // a constant-color image resizes to the same constant (bilinear exactness)
    val flat = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) flat.setRGB(x, y, 0x336699)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flat, "png", out)
    val rs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.resizeImage(out.toByteArray, 2, 2).get))
    assert((rs.getRGB(1, 1) & 0xffffff) == 0x336699)
    assert(Multimodal.resizeImage("not an image".getBytes, 2, 2).isEmpty)
  }

  test("aHash: identical bytes hash equal, scaled copy within small Hamming, inverted far") {
    val a = Multimodal.syntheticPng(42, w = 16, h = 16)
    val b = Multimodal.syntheticPng(42, w = 16, h = 16)
    assert(Multimodal.aHash(a).get == Multimodal.aHash(b).get)
    // the perceptual property: a resized copy keeps a close hash
    val scaled = Multimodal.resizeImage(a, 32, 32).get
    val d = java.lang.Long.bitCount(Multimodal.aHash(a).get ^ Multimodal.aHash(scaled).get)
    assert(d <= 8, s"scaled copy drifted $d bits")
    // luma inversion flips most bits
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      img.setRGB(x, y, ~img.getRGB(x, y) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val inv = java.lang.Long.bitCount(
      Multimodal.aHash(a).get ^ Multimodal.aHash(out.toByteArray).get)
    assert(inv >= 32, s"inverted image only $inv bits away")
    assert(Multimodal.aHash("junk".getBytes).isEmpty)
  }

  test("real audio decode: sine WAV yields textbook RMS/ZCR/peak, dispatch picks the right codec") {
    val wav = Multimodal.syntheticWav(0, nSamples = 44100) // 1 s @ 200 Hz, amp 0.5
    val f = Multimodal.decodeAudio(wav).get
    assert(math.abs(f(0) - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f(0)}")   // a/sqrt(2)
    assert(math.abs(f(1) - 2.0 * 200 / 44100) < 0.001, s"zcr ${f(1)}")   // 2f/sr
    assert(math.abs(f(3) - 0.5) < 0.01, s"peak ${f(3)}")
    // stationary sine: every quarter carries the same energy
    (4 to 7).foreach(q => assert(math.abs(f(q) - f(0)) < 0.01, s"quarter $q: ${f(q)}"))
    // determinism + distinct seeds differ (different frequency -> different zcr)
    assert(Multimodal.syntheticWav(3).sameElements(Multimodal.syntheticWav(3)))
    val f2 = Multimodal.decodeAudio(Multimodal.syntheticWav(1)).get
    assert(f2(1) > f(1), "higher seed frequency must raise zero-crossing rate")
    // dispatch: WAV is not an image, PNG is not audio, junk hits the stub
    assert(Multimodal.decodeImage(wav).isEmpty)
    assert(Multimodal.decodeAudio(Multimodal.syntheticPng(1)).isEmpty)
    assert(Multimodal.decode(wav).sameElements(f))
    assert(Multimodal.decode("junk".getBytes).length == Multimodal.FeatureDim)
    // stereo is rejected (interleaved L/R would corrupt ZCR/pooling)
    locally {
      import javax.sound.sampled._
      val sfmt = new AudioFormat(8000f, 16, 2, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](8000 * 4)), sfmt, 8000)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      assert(Multimodal.decodeAudio(bos.toByteArray).isEmpty, "stereo must be rejected")
    }
  }

  test("image near-dup pairs: planted duplicates found via band buckets, no all-pairs") {
    // ids 0..59; ids 50..59 duplicate the images of 0..9
    val rows = (0L until 60L).map(i => (i, Multimodal.syntheticPng(i % 50, w = 16, h = 16)))
    val df = rows.toDF("id", "media")
    val pairs = Multimodal.imageNearDupPairs(df, "id", "media", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = (0L until 10L).map(i => (i, i + 50L, 0))
    expected.foreach(p => assert(pairs.contains(p), s"missing planted dup $p"))
    // every reported pair at Hamming 0 must be a genuine pixel duplicate
    pairs.filter(_._3 == 0).foreach { case (x, y, _) =>
      assert(Multimodal.aHash(rows(x.toInt)._2).get == Multimodal.aHash(rows(y.toInt)._2).get)
    }
  }

  test("banding recall: Hamming-4 pair split 1/1/1/1 across 16-bit bands is found") {
    // One flipped bit inside EACH of the four 16-bit bands — the adversarial
    // case for a fixed 4-band split (no shared 16-bit band exists, so the
    // old code silently dropped this pair). With bands derived from
    // maxHamming (8×8-bit for d=4) bands 0,2,4,6 remain exact matches.
    val base = 0x0123456789abcdefL
    val other = base ^ (1L << 8) ^ (1L << 24) ^ (1L << 40) ^ (1L << 56)
    assert(java.lang.Long.bitCount(base ^ other) == 4)
    val hashes = Seq((1L, base), (2L, other), (3L, 0x7777000011114444L))
      .toDF("id", "phash")
    val got = Multimodal.nearDupPairsFromHashes(hashes, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSet == Set((1L, 2L, 4)), s"got ${got.toSeq}")
    // pigeonhole edge: d = maxHamming bits, one per band, for every band width
    for (d <- Seq(1, 3, 7, 15)) {
      val nBands = Seq(1, 2, 4, 8, 16, 32).find(_ > d).get
      val w = 64 / nBands
      val spoiled = (0 until d).foldLeft(base)((h, i) => h ^ (1L << (i * w)))
      val df2 = Seq((1L, base), (2L, spoiled)).toDF("id", "phash")
      val found = Multimodal.nearDupPairsFromHashes(df2, d).count()
      assert(found == 1, s"d=$d pair missed")
    }
    intercept[IllegalArgumentException] {
      Multimodal.nearDupPairsFromHashes(hashes, maxHamming = 32)
    }
  }

  test("EXIF orientation: the 8 remaps on a hand-built pixel grid") {
    // 3×2 grid of distinct colors; each EXIF orientation value has a
    // closed-form coordinate map, checked pixel by pixel.
    val w = 3; val h = 2
    def px(x: Int, y: Int): Int = 0x010000 * (x + 1) + 0x000100 * (y + 1)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    // (srcX, srcY) → destination coordinate per orientation tag
    val maps: Map[Int, (Int, Int) => (Int, Int)] = Map(
      1 -> ((x, y) => (x, y)),
      2 -> ((x, y) => (w - 1 - x, y)),           // flip horizontal
      3 -> ((x, y) => (w - 1 - x, h - 1 - y)),   // rotate 180
      4 -> ((x, y) => (x, h - 1 - y)),           // flip vertical
      5 -> ((x, y) => (y, x)),                   // transpose
      6 -> ((x, y) => (h - 1 - y, x)),           // rotate 90 CW
      7 -> ((x, y) => (h - 1 - y, w - 1 - x)),   // transverse
      8 -> ((x, y) => (y, w - 1 - x)))           // rotate 270 CW
    for (o <- 1 to 8) {
      val out = Multimodal.applyOrientation(img, o)
      val swap = o >= 5
      assert(out.getWidth == (if (swap) h else w) && out.getHeight == (if (swap) w else h),
        s"o=$o dims ${out.getWidth}x${out.getHeight}")
      for (y <- 0 until h; x <- 0 until w) {
        val (dx, dy) = maps(o)(x, y)
        assert((out.getRGB(dx, dy) & 0xffffff) == px(x, y),
          s"o=$o src($x,$y) expected at ($dx,$dy)")
      }
    }
    // out-of-range tags are identity
    assert(Multimodal.applyOrientation(img, 0) eq img)
    assert(Multimodal.applyOrientation(img, 9) eq img)
  }

  test("EXIF orientation: tag parse round-trip, byte orders, malformed → 1") {
    val base = {
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticPng(5L, 9, 6)))
      Multimodal.encodeJpeg(src, 0.9f)
    }
    assert(Multimodal.exifOrientation(base) == 1, "untagged JPEG defaults to 1")
    for (o <- 1 to 8)
      assert(Multimodal.exifOrientation(Multimodal.withExifOrientation(base, o)) == o,
        s"big-endian round-trip o=$o")
    // hand-built little-endian TIFF carrying orientation 6
    val leTiff = Array[Byte](
      'I', 'I', 42, 0, 8, 0, 0, 0,           // little-endian header, IFD0 at 8
      1, 0,                                  // one entry
      0x12, 0x01, 3, 0, 1, 0, 0, 0,          // tag 0x0112, SHORT, count 1
      6, 0, 0, 0,                            // value 6
      0, 0, 0, 0)
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ leTiff
    val len = payload.length + 2
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    assert(Multimodal.exifOrientation(base.take(2) ++ seg ++ base.drop(2)) == 6,
      "little-endian Exif")
    // malformed Exif blocks must not refuse the image: orientation 1
    val truncated = (base.take(2) ++ seg).dropRight(8)
    assert(Multimodal.exifOrientation(truncated) == 1, "truncated Exif → 1")
    val garbage = base.take(2) ++
      Array[Byte](0xff.toByte, 0xe1.toByte, 0, 10, 'E', 'x', 'i', 'f', 0, 0, 99, 99) ++
      base.drop(2)
    assert(Multimodal.exifOrientation(garbage) == 1, "garbage TIFF header → 1")
    assert(Multimodal.decodeImage(garbage).isDefined, "malformed Exif still decodes")
  }

  test("EXIF orientation: decodeImage equals rotate-then-pool on the same pixels") {
    // JPEG is lossy, so the invariant is over DECODED pixels: the
    // production path (tagged bytes → decodeImage) must equal decoding
    // the untagged bytes, remapping, and pooling.
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.syntheticPng(11L, 9, 6)))
    val jpeg = Multimodal.encodeJpeg(src, 0.9f)
    val plain = Multimodal.decodeImage(jpeg).get
    for (o <- 1 to 8) {
      val prod = Multimodal.decodeImage(Multimodal.withExifOrientation(jpeg, o)).get
      val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      val ref = Multimodal.poolImage(Multimodal.applyOrientation(dec, o)).get
      assert(java.util.Arrays.equals(prod, ref), s"o=$o production vs reference pooling")
      if (o > 1)
        assert(!java.util.Arrays.equals(prod, plain),
          s"o=$o must observably change quadrant features")
    }
    // PNG bytes never consult Exif (no JPEG SOI): unchanged path
    val png = Multimodal.syntheticPng(11L, 9, 6)
    assert(java.util.Arrays.equals(
      Multimodal.decodeImage(png).get, Multimodal.decodeImage(png).get))
  }

  test("oracle mirror: independent pure-math constants equal the real codec path") {
    // MultimodalOracle constants come from tools/gen_multimodal_oracle.py —
    // no AWT/ImageIO/javax.sound — so equality here proves the PNG/WAV
    // containers round-trip losslessly and the 8×8 bilinear resize inside
    // aHash is the identity. A drift in either codec path breaks this.
    for (seed <- Seq(0, 1, 7, 137, 298, 299)) {
      val png = Multimodal.syntheticPng(seed.toLong)
      assert(Multimodal.aHash(png).get == graft.queries.MultimodalOracle.imageHash(seed),
        s"aHash mismatch for seed $seed")
    }
    for (seed <- Seq(0, 1, 13, 39)) {
      val f = Multimodal.decodeAudio(Multimodal.syntheticWav(seed.toLong)).get
      val (rms, zcr, peak) = graft.queries.MultimodalOracle.audioFeat(seed)
      assert(math.abs(f(0) - rms.toDouble) < 5e-5, s"rms seed $seed: ${f(0)} vs $rms")
      assert(math.abs(f(1) - zcr.toDouble) < 5e-6, s"zcr seed $seed: ${f(1)} vs $zcr")
      assert(math.abs(f(3) - peak.toDouble) < 5e-5, s"peak seed $seed: ${f(3)} vs $peak")
    }
  }
}
