package graft

import graft.ops.{Flac, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The native FLAC codec's correctness contract: LOSSLESS. Every
  * round-trip here is integer-exact equality, not approximation — the
  * property that makes compressed audio oracle-able at all. Property
  * sweeps use seeded deterministic samples (the scalatest+scalacheck
  * bridge is not in the offline cache — same stance as GeoSpec).
  */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(chans: Array[Array[Int]],
                        stereo: Flac.Stereo.Value = Flac.Stereo.Independent,
                        bps: Int = 16, blockSize: Int = 576): Unit = {
    val enc = Flac.encode(chans, 44100, bps, blockSize, stereo)
    val dec = Flac.decode(enc)
    assert(dec.isDefined, "decode must succeed")
    val d = dec.get
    assert(d.info.channels == chans.length)
    assert(d.bitsPerSample == bps)
    assert(d.sampleRate == 44100)
    chans.zip(d.channels).zipWithIndex.foreach { case ((exp, got), c) =>
      assert(got.length == exp.length, s"channel $c length")
      var i = 0
      while (i < exp.length) {
        assert(got(i) == exp(i), s"channel $c sample $i: ${got(i)} != ${exp(i)}")
        i += 1
      }
    }
  }

  test("mono sine round-trips bit-exactly across all 40 fixture seeds") {
    // 4410 samples / 576-block frames = 8 frames per seed, so the encoder's
    // rotating strategy covers VERBATIM, FIXED 0-4 and LPC in every stream
    for (seed <- 0L until 40L)
      roundTrip(Array(Multimodal.sineSamples(seed)))
  }

  test("each subframe strategy round-trips alone (single-frame streams)") {
    val data = Multimodal.sineSamples(7L).take(576)
    // one frame => strategy = frameIdx % 7 = 0; vary data length to stay
    // one frame while the encoder cycles per-frame — instead force the
    // cycle by encoding 7 frames and checking the whole stream (above),
    // plus degenerate shapes here:
    roundTrip(Array(data))                              // 1 frame, VERBATIM
    roundTrip(Array(Array.fill(576)(123)))              // constant signal
    roundTrip(Array(Array.fill(5)(-17)))                // tiny tail-only frame
    roundTrip(Array(Array.tabulate(2000)(i => i % 32 - 16))) // multi-frame ramp
  }

  test("stereo round-trips under all four decorrelation modes") {
    val l = Multimodal.sineSamples(3L).take(1200)
    val r = Multimodal.sineSamples(11L).take(1200)
    for (mode <- Seq(Flac.Stereo.Independent, Flac.Stereo.LeftSide,
        Flac.Stereo.RightSide, Flac.Stereo.MidSide))
      roundTrip(Array(l, r), stereo = mode)
  }

  test("random 16-bit PCM round-trips (seeded property sweep)") {
    val rnd = new scala.util.Random(0xf1ac)
    for (_ <- 0 until 40) {
      val n = 1 + rnd.nextInt(3000)
      val xs = Array.fill(n)(rnd.nextInt(65536) - 32768)
      roundTrip(Array(xs))
    }
  }

  test("8-bit and 24-bit sample sizes round-trip") {
    roundTrip(Array(Array.tabulate(700)(i => (i % 256) - 128)), bps = 8)
    roundTrip(Array(Array.tabulate(700)(i => i * 12345 % (1 << 23) - (1 << 22))), bps = 24)
  }

  test("corrupted streams decode to None, never throw") {
    val good = Multimodal.syntheticFlac(5L)
    assert(Flac.decode(null).isEmpty)
    assert(Flac.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Flac.decode("fLaCbogus".getBytes ++ new Array[Byte](64)).isEmpty)
    // flip a PCM-carrying byte deep in the frame payload: either a frame
    // CRC or the STREAMINFO MD5 must catch it
    val bad = good.clone(); bad(good.length - 40) = (bad(good.length - 40) ^ 0x55).toByte
    assert(Flac.decode(bad).isEmpty, "bit flip must fail CRC/MD5, not decode silently")
    // truncation mid-frame
    assert(Flac.decode(good.take(good.length - 7)).isEmpty)
  }

  test("FLAC fixture features are byte-identical to the WAV fixture features") {
    // lossless compression of the same signal must be invisible to the
    // feature kernel — this is what lets p72 reuse p39's oracle literals
    for (seed <- 0L until 40L) {
      val viaWav = Multimodal.decode(Multimodal.syntheticWav(seed))
      val viaFlac = Multimodal.decode(Multimodal.syntheticFlac(seed))
      assert(viaWav.toSeq == viaFlac.toSeq, s"seed $seed features diverge")
    }
  }

  test("the FLAC fixture actually compresses (not a verbatim container)") {
    val wav = Multimodal.syntheticWav(0L)
    val flac = Multimodal.syntheticFlac(0L)
    assert(flac.length < wav.length,
      s"FLAC ${flac.length}B should beat raw PCM ${wav.length}B on a sine")
  }

  test("decode rejects MD5-valid streams javax.sound would misparse as audio") {
    // FLAC magic but truncated STREAMINFO
    assert(Flac.decode("fLaC".getBytes ++ new Array[Byte](10)).isEmpty)
  }
}
