package graft

import graft.ops.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Mp3]]: frame-grammar inventory — sync walk, ID3v2 syncsafe
  * skip, exact frame stepping, corruption loudness.
  */
class Mp3Spec extends AnyFunSuite {

  test("synthetic streams round-trip the closed-form inventory for 70 seeds") {
    (0L until 70L).foreach { seed =>
      val inv = Mp3.parse(Mp3.syntheticMp3(seed))
        .getOrElse(fail(s"seed $seed: no frames parsed"))
      val n = 3 + (seed % 4).toInt
      // version by seed % 7: 5 -> MPEG-2, 6 -> MPEG-2.5, else MPEG-1 —
      // with version-keyed samplerate/bitrate tables and 576-sample LSF
      // frames (VERDICT r11 #4)
      val (verName, srTab, brTab, spf) = (seed % 7) match {
        case 5 => ("2", Array(22050, 24000, 16000), Mp3.BitrateKbpsV2, 576)
        case 6 => ("2.5", Array(11025, 12000, 8000), Mp3.BitrateKbpsV2, 576)
        case _ => ("1", Array(44100, 48000, 32000), Mp3.BitrateKbps, 1152)
      }
      val sr = srTab((seed % 3).toInt)
      val brs = (0 until n).map(i => brTab(1 + ((seed + i) % 14).toInt))
      assert(inv.nFrames === n, s"seed $seed")
      assert(inv.mpegVersion === verName, s"seed $seed")
      assert(inv.sampleRateHz === sr, s"seed $seed")
      assert(inv.brMinKbps === brs.min && inv.brMaxKbps === brs.max, s"seed $seed")
      assert(inv.durationUs === n.toLong * spf * 1000000L / sr, s"seed $seed")
      assert(inv.isVbr === (brs.min != brs.max), s"seed $seed")
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

  test("MPEG-2 headers inventory with LSF tables; reserved version refuses") {
    // 0xff 0xf3: version bits 10 (MPEG-2), brIdx 4 -> 32 kbps (the LSF
    // row, NOT MPEG-1's 56), srIdx 0 -> 22050 Hz, 72-factor frame size
    val size2 = 72 * 32000 / 22050 // 104
    val mpeg2 = Array(0xff, 0xf3, (4 << 4) | (0 << 2), 0xc0).map(_.toByte) ++
      Array.fill[Byte](size2 - 4)(0)
    val inv2 = Mp3.parse(mpeg2).get
    assert(inv2.nFrames === 1 && inv2.mpegVersion === "2")
    assert(inv2.sampleRateHz === 22050 && inv2.brMinKbps === 32)
    assert(inv2.durationUs === 576L * 1000000L / 22050)
    // 0xff 0xe3: version bits 00 (MPEG-2.5), srIdx 2 -> 8000 Hz
    val size25 = 72 * 32000 / 8000
    val mpeg25 = Array(0xff, 0xe3, (4 << 4) | (2 << 2), 0xc0).map(_.toByte) ++
      Array.fill[Byte](size25 - 4)(0)
    val inv25 = Mp3.parse(mpeg25).get
    assert(inv25.mpegVersion === "2.5" && inv25.sampleRateHz === 8000)
    // 0xff 0xeb: version bits 01 are RESERVED — the walk refuses
    val reserved = Array(0xff, 0xeb, (4 << 4) | (0 << 2), 0xc0).map(_.toByte) ++
      Array.fill[Byte](200)(0)
    assert(Mp3.parse(reserved).isEmpty)
    // a mid-stream VERSION change marks corruption (frames before kept)
    val one = {
      val brIdx = 4; val size = 144 * Mp3.BitrateKbps(brIdx) * 1000 / 44100
      val b = new java.io.ByteArrayOutputStream()
      b.write(0xff); b.write(0xfb); b.write((brIdx << 4) | (0 << 2)); b.write(0xc0)
      (4 until size).foreach(_ => b.write(0))
      b.toByteArray
    }
    val inv = Mp3.parse(one ++ mpeg2).get
    assert(inv.nFrames === 1 && inv.sampleRateHz === 44100 &&
      inv.mpegVersion === "1")
  }

  test("MP3 routes through the media vocabulary: media_kind = mp3") {
    val bytes = Mp3.syntheticMp3(9L) // MPEG-1, 3 + 9%4 = 4 frames, 44100
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(bytes)
    assert(kind === "mp3")
    assert(feats(0) === 4f && feats(1) === 44100f)
    // a lone sync-shaped header (one frame) stays out of the route:
    // arbitrary binary must not catch the mp3 label by accident
    val one = Array(0xff, 0xfb, (4 << 4) | (0 << 2), 0xc0).map(_.toByte) ++
      Array.fill[Byte](200)(0)
    assert(graft.ops.Multimodal.decodeWithKind(one)._1 === "stub")
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
