package graft

import graft.functions.MojibakeFix
import org.scalatest.funsuite.AnyFunSuite

class MojibakeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def fix(s: String): (String, Int) = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = Seq(s).toDF("t")
      .select(MojibakeFix(spark, $"t").as("m"))
      .select($"m.fixed", $"m.rounds").head()
    (r.getString(0), r.getInt(1))
  }

  test("single mojibake repairs: the classic Ã©/â‚¬ forms") {
    assert(fix("CafÃ©") == ("Café", 1))
    assert(fix("â‚¬ 5 fÃ¼r GlÃ¼ck") == ("€ 5 für Glück", 1))
    assert(fix("donâ€™t") == ("don’t", 1))
  }

  test("double mojibake repairs in two rounds") {
    val orig = "naïve café — €9"
    val m2 = MojibakeFix.corruptOnce(MojibakeFix.corruptOnce(orig))
    assert(fix(m2) == (orig, 2))
  }

  test("conservative: honest text is NEVER altered") {
    assert(fix("plain ascii stays") == ("plain ascii stays", 0))
    assert(fix("café au lait") == ("café au lait", 0), "legacy latin-1 text")
    assert(fix("résumé naïve") == ("résumé naïve", 0))
    assert(fix("宅配 テスト") == ("宅配 テスト", 0), "CJK is unmappable, untouched")
    assert(fix("mixed 宅 Ã©") == ("mixed 宅 Ã©", 0),
      "a genuinely-mixed string fails the byte map and stays whole")
  }

  test("latin-1 leg: C1 control chars from lenient decoders map back") {
    // corrupt "e–f" (en dash, UTF-8 E2 80 93) through a LATIN-1
    // misdecode: bytes become â + U+0080 control? no — latin-1 maps
    // 0x80 to the C1 control; build that form directly
    val latin1Moji = new String("e–f".getBytes("UTF-8"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(latin1Moji.exists(c => c >= 0x80 && c < 0xa0), "has C1 controls")
    assert(fix(latin1Moji) == ("e–f", 1))
  }

  test("corruptOnce is the exact forward model of a sloppy-1252 decode") {
    assert(MojibakeFix.corruptOnce("é") == "Ã©")
    assert(MojibakeFix.corruptOnce("€") == "â‚¬")
    assert(MojibakeFix.corruptOnce("’") == "â€™")
    // undefined 1252 bytes surface as C1 controls (ü-> C3 BC is defined;
    // U+0090 byte appears in e.g. "ѐ" = D1 90)
    assert(MojibakeFix.corruptOnce("ѐ") == "Ñ")
    assert(fix("Ñ") == ("ѐ", 1))
  }

  test("rounds cap prevents unbounded iteration") {
    var t = "é"
    for (_ <- 0 until 6) t = MojibakeFix.corruptOnce(t)
    val (_, rounds) = fix(t)
    assert(rounds == 4, "cap at 4 rounds")
  }

  test("SQL registration: mojibake_fix resolves through the extension") {
    MojibakeFix.register(spark)
    val r = spark.sql(
      "SELECT mojibake_fix('CafÃ©').fixed AS f, mojibake_fix('CafÃ©').rounds AS n")
      .head()
    assert(r.getString(0) == "Café" && r.getInt(1) == 1)
  }

  test("null and empty are identity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(Some(""), None).toDF("t")
      .select(MojibakeFix(spark, $"t").as("m")).collect()
    assert(rows(0).getStruct(0).getString(0) == "")
    assert(rows(1).isNullAt(0))
  }
}
