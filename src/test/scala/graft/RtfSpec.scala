package graft

import graft.ops.Rtf
import org.scalatest.funsuite.AnyFunSuite

class RtfSpec extends AnyFunSuite {

  private def extract(s: String): Option[Vector[String]] =
    Rtf.extractText(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  test("fixture round-trip: 80 seeds extract exactly the closed-form text") {
    for (seed <- 0L until 80L) {
      val got = Rtf.extractText(Rtf.syntheticRtf(seed))
        .getOrElse(fail(s"seed $seed refused"))
      val want = (0 until Rtf.paraCount(seed)).map(Rtf.logicalPara(seed, _))
      assert(got == want.toVector, s"seed $seed")
    }
  }

  test("destinations contribute nothing; escapes, \\line, \\tab are content") {
    val doc = """{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\colortbl;\red1\green2\blue3;}
                |{\stylesheet{\s0 Normal;}}{\*\generator X 1.0;}{\info{\title T}}
                |Hello\tab a\{b\}\\c\line world\par
                |second\par}""".stripMargin
    assert(extract(doc) == Some(Vector("Hello\ta{b}\\c\nworld", "second")))
  }

  test("\\u fallback skipping scopes with the group stack") {
    // uc=1 default: one fallback char swallowed after \u233
    assert(extract("{\\rtf1 x\\u233?y\\par}") == Some(Vector("xéy")))
    // a \'hh counts as ONE fallback char
    assert(extract("{\\rtf1 x\\u233\\'3fy\\par}") == Some(Vector("xéy")))
    // {\uc2 ...} swallows two, and uc reverts after the brace
    assert(extract("{\\rtf1 a{\\uc2\\u8721 xy}b\\u233?c\\par}") ==
      Some(Vector("a∑béc")))
    // negative code points are the signed-16-bit convention
    assert(extract("{\\rtf1 \\u-1532?\\par}") == Some(Vector("宅")))
    // a group boundary ends any pending fallback run
    assert(extract("{\\rtf1 {\\uc2\\u65 }ok\\par}") == Some(Vector("Aok")))
  }

  test("cp1252 bytes: C1 remap, latin-1 passthrough, undefined bytes refuse") {
    assert(extract("{\\rtf1 \\'80\\'93\\'e9\\par}") ==
      Some(Vector("€“é")))
    assert(extract("{\\rtf1 \\'81\\par}").isEmpty, "0x81 undefined in cp1252")
    assert(extract("{\\rtf1 \\'9d\\par}").isEmpty, "0x9D undefined in cp1252")
  }

  test("\\bin skips raw bytes blind; pict hex is non-content") {
    val doc = "{\\rtf1 a{\\pict\\bin4 }\\{ÿx}b{\\pict\\wmetafile8 0102}c\\par}"
    assert(extract(doc) == Some(Vector("abc")))
    // \bin running past EOF refuses
    assert(extract("{\\rtf1 a{\\pict\\bin99 xx}b\\par}").isEmpty)
  }

  test("raw source newlines are formatting, not content") {
    assert(extract("{\\rtf1 one\r\ntwo\\par}") == Some(Vector("onetwo")))
  }

  test("special symbol words map deterministically") {
    assert(extract("{\\rtf1 a\\~b\\emdash c\\rquote d\\bullet e\\par}") ==
      Some(Vector("a b—c’d•e")))
    // optional hyphen contributes nothing
    assert(extract("{\\rtf1 hy\\-phen\\par}") == Some(Vector("hyphen")))
  }

  test("trailing text without a final \\par still emits a paragraph") {
    assert(extract("{\\rtf1 first\\par tail}") == Some(Vector("first", "tail")))
  }

  test("refusal suite: wrong magic, imbalance, bad hex, codepage, trailing junk") {
    assert(extract("not rtf at all").isEmpty)
    assert(extract("{\\rtx1 hello\\par}").isEmpty, "wrong magic word")
    assert(extract("{\\rtf1 {unclosed\\par}").isEmpty, "unbalanced open")
    assert(extract("{\\rtf1 x\\par}}").isEmpty, "content after document group")
    assert(extract("{\\rtf1 \\'zq\\par}").isEmpty, "bad hex digits")
    assert(extract("{\\rtf1 \\'8").isEmpty, "truncated hex escape")
    assert(extract("{\\rtf1\\ansicpg932 x\\par}").isEmpty, "unsupported codepage")
    assert(extract("{\\rtf1 x\\par").isEmpty, "unterminated document")
    assert(Rtf.extractText(null).isEmpty)
    assert(Rtf.extractText(Array[Byte]('{', '\\')).isEmpty)
  }

  test("media_kind routes rtf; arbitrary brace text stays stub") {
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(Rtf.syntheticRtf(3L))
    assert(kind == "rtf")
    val text = (0 until Rtf.paraCount(3L)).map(Rtf.logicalPara(3L, _)).mkString("\n")
    assert(feats(0) == Rtf.paraCount(3L).toFloat)
    assert(feats(2) == text.length.toFloat)
    assert(graft.ops.Multimodal.decodeWithKind("{not rtf}".getBytes)._1 == "stub")
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "rtf-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.rtf"),
        Rtf.syntheticRtf(seed))
      val text = (0 until Rtf.paraCount(seed))
        .map(Rtf.logicalPara(seed, _)).mkString("\n")
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        text.getBytes("UTF-8"))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.rtf")))
  }
}
