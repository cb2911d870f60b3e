package graft

import graft.ops.Tar
import org.scalatest.funsuite.AnyFunSuite

class TarSpec extends AnyFunSuite {

  private def mk(members: (String, String)*): Array[Byte] =
    Tar.write(members.map { case (p, t) => p -> t.getBytes("UTF-8") })

  test("round-trip: members in order, byte-exact, multiple sizes") {
    val members = Seq(
      "a.txt" -> "x",
      "dir/b.txt" -> ("y" * 511),      // exactly under one block
      "dir/c.txt" -> ("z" * 513),      // spills into a second block
      "empty.txt" -> "")
    val got = Tar.extract(mk(members: _*)).get
    assert(got.map(_._1) == members.map(_._1).toVector)
    got.zip(members).foreach { case ((_, b), (_, t)) =>
      assert(new String(b, "UTF-8") == t)
    }
  }

  test("non-regular entries step over without extracting or de-aligning") {
    val bytes = Tar.writeEntries(Seq(
      ("corpus", Array.empty[Byte], '5'.toByte),
      ("pax.meta", "19 comment=hello\n".getBytes("UTF-8"), 'x'.toByte),
      ("real.txt", "payload".getBytes("UTF-8"), '0'.toByte)))
    val got = Tar.extract(bytes).get
    assert(got.map(_._1) == Vector("real.txt"))
    assert(new String(got.head._2, "UTF-8") == "payload")
  }

  test("long paths round-trip through the ustar prefix field") {
    val long = ("seg" * 40) + "/" + ("leaf" * 20) + ".txt" // >100 bytes
    assert(long.length > 100)
    val got = Tar.extract(Tar.write(Seq(long -> "deep".getBytes))).get
    assert(got.map(_._1) == Vector(long))
  }

  test("checksum verification: one flipped header byte refuses") {
    val bytes = mk("a.txt" -> "hello")
    val bad = bytes.clone()
    bad(0) = 'Z' // name byte no longer matches the checksum
    assert(Tar.extract(bad).isEmpty)
  }

  test("refusals: magic, octal, overrun, trailer") {
    assert(Tar.extract(null).isEmpty)
    assert(Tar.extract(new Array[Byte](512)).isEmpty, "not block-even trailer")
    val good = mk("a.txt" -> "hello")
    val badMagic = good.clone(); badMagic(257) = 'X'
    assert(Tar.extract(badMagic).isEmpty)
    // a decimal-looking size byte ('9') is not octal
    val badSize = good.clone(); badSize(124) = '9'
    assert(Tar.extract(badSize).isEmpty)
    // member size overrunning the archive refuses
    assert(Tar.extract(good.take(1024)).isEmpty, "trailer stripped")
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "tar-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      val members = (0 until (1 + seed % 3).toInt).map { i =>
        val body = s"Member $seed/$i " +
          org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$seed|$i")
        (s"corpus/s$seed/m$i.txt", body.getBytes("UTF-8"), '0'.toByte)
      }
      val entries = ("corpus", Array.empty[Byte], '5'.toByte) +: members
      java.nio.file.Files.write(dir.resolve(s"seed$seed.tar"),
        Tar.writeEntries(entries))
      val golden = members.map { case (p, b, _) =>
        p + " " + new String(b, "UTF-8")
      }.mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        golden.getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.tar")))
  }
}
