package graft

import graft.ops.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Mp3]]: frame-grammar inventory — sync walk, ID3v2 syncsafe
  * skip, exact frame stepping, corruption loudness.
  */
class Mp3Spec extends AnyFunSuite {

  test("synthetic streams round-trip the closed-form inventory for 60 seeds") {
    (0L until 60L).foreach { seed =>
      val inv = Mp3.parse(Mp3.syntheticMp3(seed))
        .getOrElse(fail(s"seed $seed: no frames parsed"))
      val n = 3 + (seed % 4).toInt
      val sr = Array(44100, 48000, 32000)((seed % 3).toInt)
      val brs = (0 until n).map(i => Mp3.BitrateKbps(1 + ((seed + i) % 14).toInt))
      assert(inv.nFrames === n, s"seed $seed")
      assert(inv.sampleRateHz === sr)
      assert(inv.brMinKbps === brs.min && inv.brMaxKbps === brs.max)
      assert(inv.durationUs === n.toLong * 1152 * 1000000L / sr)
      assert(inv.isVbr === (brs.min != brs.max))
    }
  }

  test("truncated tail frame is ignored, prior frames survive") {
    val full = Mp3.syntheticMp3(5L) // odd seed: no ID3
    val n = Mp3.parse(full).get.nFrames
    val cut = java.util.Arrays.copyOf(full, full.length - 10)
    assert(Mp3.parse(cut).get.nFrames === n - 1)
  }

  test("corrupt sync and reserved indexes stop the walk loudly") {
    assert(Mp3.parse(Array[Byte](1, 2, 3, 4)).isEmpty)
    // bitrate index 0 (free-format) and 15 (reserved) both refuse
    val free = Array(0xff, 0xfb, 0x00 | (0 << 2), 0xc0).map(_.toByte)
    assert(Mp3.parse(free).isEmpty)
    val bad = Array(0xff, 0xfb, 0xf0, 0xc0).map(_.toByte)
    assert(Mp3.parse(bad).isEmpty)
    // flipping the first header byte of frame 2 keeps only frame 1
    val s = Mp3.syntheticMp3(7L)
    val firstLen = 144 * Mp3.BitrateKbps(1 + (7 % 14)) * 1000 / 48000 + 1
    val mut = s.clone(); mut(firstLen) = 0x00
    assert(Mp3.parse(mut).get.nFrames === 1)
  }

  test("MPEG-2 Layer III headers stop the walk (version bits are pinned)") {
    // 0xff 0xf3: valid 11-bit sync but version bits 10 (MPEG-2). Decoding
    // it with MPEG-1 tables would claim a frame; the walk must refuse.
    val mpeg2 = Array(0xff, 0xf3, (4 << 4) | (0 << 2), 0xc0).map(_.toByte) ++
      Array.fill[Byte](200)(0)
    assert(Mp3.parse(mpeg2).isEmpty)
    // and an MPEG-2 header after one legal MPEG-1 frame keeps only frame 1
    val one = {
      val brIdx = 4; val size = 144 * Mp3.BitrateKbps(brIdx) * 1000 / 44100
      val b = new java.io.ByteArrayOutputStream()
      b.write(0xff); b.write(0xfb); b.write((brIdx << 4) | (0 << 2)); b.write(0xc0)
      (4 until size).foreach(_ => b.write(0))
      b.toByteArray
    }
    val inv = Mp3.parse(one ++ mpeg2).get
    assert(inv.nFrames === 1 && inv.sampleRateHz === 44100)
  }

  test("ID3v2 prefix skips by syncsafe length; malformed syncsafe refuses") {
    val withId3 = Mp3.syntheticMp3(4L) // even seed: ID3 present
    assert(withId3.take(3).map(_.toChar).mkString === "ID3")
    assert(Mp3.parse(withId3).isDefined)
    // set a high bit inside the syncsafe size: tag malformed -> no skip ->
    // no sync at pos 0 -> empty
    val mut = withId3.clone(); mut(9) = 0x8a.toByte
    assert(Mp3.parse(mut).isEmpty)
  }

  test("a mid-stream samplerate change marks corruption (frames before it kept)") {
    val a = Mp3.syntheticMp3(3L) // srIdx 0
    // hand-build a second frame at a different samplerate appended to one
    // legal 44100 frame
    val one = {
      val brIdx = 4; val size = 144 * Mp3.BitrateKbps(brIdx) * 1000 / 44100
      val b = new java.io.ByteArrayOutputStream()
      b.write(0xff); b.write(0xfb); b.write((brIdx << 4) | (0 << 2)); b.write(0xc0)
      (4 until size).foreach(_ => b.write(0))
      b.toByteArray
    }
    val other = {
      val brIdx = 4; val size = 144 * Mp3.BitrateKbps(brIdx) * 1000 / 48000
      val b = new java.io.ByteArrayOutputStream()
      b.write(0xff); b.write(0xfb); b.write((brIdx << 4) | (1 << 2)); b.write(0xc0)
      (4 until size).foreach(_ => b.write(0))
      b.toByteArray
    }
    val mixed = one ++ other
    val inv = Mp3.parse(mixed).get
    assert(inv.nFrames === 1 && inv.sampleRateHz === 44100)
    assert(a.nonEmpty)
  }
}
