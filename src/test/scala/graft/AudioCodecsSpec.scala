package graft

import graft.ops.{G711, ImaAdpcm, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Native G.711 / IMA ADPCM codec contracts.
  *
  * The p73 oracle pins the full encode→decode→DSP chain against the
  * independent Python mirror at sf scale; this spec pins the codec-level
  * invariants exhaustively (all 65536 inputs, all 256 codewords) and the
  * RIFF container round-trip, so a regression localizes to a function
  * rather than a hash mismatch.
  */
class AudioCodecsSpec extends AnyFunSuite {

  test("G.711 u-law: exhaustive quantization bound + codeword idempotence") {
    var worst = 0
    var x = -32768
    while (x <= 32767) {
      val dec = G711.ulawToLinear(G711.linearToUlaw(x.toShort)).toInt
      worst = math.max(worst, math.abs(dec - x))
      x += 1
    }
    // top-segment spacing is 8<<7 = 1024; clip region stays under it too
    assert(worst <= 1024, s"u-law worst error $worst")
    // re-encoding a decoded codeword is the identity (u-law's two zero
    // codewords 0x7F/0xFF both decode to 0, which re-encodes to 0xFF)
    for (b <- 0 to 255) {
      val dec = G711.ulawToLinear(b.toByte)
      val re = G711.linearToUlaw(dec) & 0xff
      if (dec == 0) assert(re == 0xff || re == 0x7f)
      else assert(re == b, s"u-law codeword $b decodes to $dec, re-encodes to $re")
    }
  }

  test("G.711 A-law: exhaustive quantization bound + codeword stability") {
    var worst = 0
    var x = -32768
    while (x <= 32767) {
      val dec = G711.alawToLinear(G711.linearToAlaw(x.toShort)).toInt
      worst = math.max(worst, math.abs(dec - x))
      x += 1
    }
    // top-segment spacing is 16<<6 = 1024 (plus the >>3 fold's 8)
    assert(worst <= 1024, s"A-law worst error $worst")
    // decoded codewords land on reconstruction levels: decode∘encode is
    // the identity ON those levels (the fixed-point property a correct
    // segmented quantizer must have)
    for (b <- 0 to 255) {
      val dec = G711.alawToLinear(b.toByte)
      val redec = G711.alawToLinear(G711.linearToAlaw(dec))
      assert(redec == dec, s"A-law level $dec (codeword $b) not a fixed point: $redec")
    }
  }

  test("IMA ADPCM: sine round-trip SNR, block headers, determinism") {
    for (seed <- Seq(0L, 13L, 39L)) {
      val pcm = Array.tabulate(4410)(i =>
        (0.5 * math.sin(2 * math.Pi * (200.0 + (seed % 40) * 50.0) * i / 44100) * 32767).toInt)
      val blockAlign = 256
      val data = ImaAdpcm.encode(pcm, blockAlign)
      val spb = ImaAdpcm.samplesPerBlock(blockAlign)
      assert(data.length == ((pcm.length + spb - 1) / spb) * blockAlign)
      val dec = ImaAdpcm.decode(data, blockAlign, pcm.length)
      assert(dec.length == pcm.length)
      // each block's first decoded sample IS the block header predictor
      // (clamped input sample) — the spec-mandated seam behavior
      for (blk <- 0 until data.length / blockAlign) {
        val s0 = blk * spb
        if (s0 < pcm.length) assert(dec(s0) == pcm(s0))
      }
      // 4-bit differential tracking of a smooth signal: error well under
      // the signal scale (SNR-style bound, not bit-exactness — exactness
      // is pinned cross-language by the lossyFeat literals below)
      val errRms = math.sqrt(
        pcm.indices.map(i => { val e = (dec(i) - pcm(i)).toDouble; e * e }).sum / pcm.length)
      val sigRms = math.sqrt(pcm.map(v => v.toDouble * v).sum / pcm.length)
      assert(errRms < sigRms * 0.05, s"seed $seed: errRms $errRms vs sigRms $sigRms")
      // decode is a pure function of the bytes
      assert(ImaAdpcm.decode(data, blockAlign, pcm.length).sameElements(dec))
    }
  }

  test("companded RIFF containers decode through the dispatch, not the stub") {
    for (codec <- Seq("ulaw", "alaw", "adpcm")) {
      val bytes = Multimodal.syntheticCompandedWav(7L, codec)
      val viaParser = Multimodal.decodeCompandedAudio(bytes)
      assert(viaParser.isDefined, s"$codec container not parsed")
      // the full dispatch must land on the SAME real decode (javax.sound
      // must not claim the non-PCM container, FLAC must reject it, and
      // the stub must never be reached)
      val viaDispatch = Multimodal.decode(bytes)
      assert(viaDispatch.sameElements(viaParser.get), s"$codec dispatch diverged")
      val stub = Multimodal.stubDecode(bytes)
      assert(!viaDispatch.sameElements(stub), s"$codec fell through to the stub")
    }
    // malformed / unsupported containers reject cleanly
    assert(Multimodal.decodeCompandedAudio(null).isEmpty)
    assert(Multimodal.decodeCompandedAudio(Array.fill[Byte](20)(1)).isEmpty)
    val truncated = Multimodal.syntheticCompandedWav(0L, "adpcm").take(40)
    assert(Multimodal.decodeCompandedAudio(truncated).isEmpty)
    // PCM WAV (tag 1) is javax.sound's territory — the companded parser
    // must not claim it
    assert(Multimodal.decodeCompandedAudio(Multimodal.syntheticWav(0L)).isEmpty)
  }

  test("oracle mirror: Python-derived lossy literals equal the Scala codec path") {
    // lossyFeat comes from tools/gen_multimodal_oracle.py, which re-implements
    // u-law/A-law/ADPCM encode+decode in Python with no shared code — equality
    // across all 120 (codec, seed) cells is a full cross-language differential
    // of the codec math, the container round-trip, and the DSP.
    val byCodec = graft.queries.MultimodalOracle.lossyFeat.zipWithIndex
      .map { case ((c, r, z, p), i) => ((c, i % 40), (r, z, p)) }.toMap
    for (codec <- Seq("ulaw", "alaw", "adpcm"); seed <- 0 until 40) {
      val f = Multimodal.decodeCompandedAudio(
        Multimodal.syntheticCompandedWav(seed.toLong, codec)).get
      val (rms, zcr, peak) = byCodec((codec, seed))
      assert(math.abs(f(0) - rms.toDouble) < 5e-5, s"rms $codec/$seed: ${f(0)} vs $rms")
      assert(math.abs(f(1) - zcr.toDouble) < 5e-6, s"zcr $codec/$seed: ${f(1)} vs $zcr")
      assert(math.abs(f(3) - peak.toDouble) < 5e-5, s"peak $codec/$seed: ${f(3)} vs $peak")
    }
  }
}
