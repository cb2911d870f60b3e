package graft

import graft.ops.Hygiene
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Hygiene]]: per-source boilerplate line removal and
  * secret-token scrubbing.
  */
class HygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 4 docs on host A (nav in all 4, promo in exactly 2, rare in 1),
  // 2 docs on host B (its own nav; A's nav appears ONCE — must survive)
  private def pages = Seq(
    (1L, "A", "NAV A\ncontent one\nPROMO A"),
    (2L, "A", "NAV A\ncontent two"),
    (3L, "A", "NAV A\ncontent three\nPROMO A\nRARE A"),
    (4L, "A", "NAV A\ncontent four"),
    (5L, "B", "NAV B\ncontent five\nNAV A"),
    (6L, "B", "NAV B\ncontent six")
  ).toDF("doc_id", "source", "page")

  test("frequency floor and fraction threshold, per source") {
    val bp = Hygiene.boilerplateTable(pages, "source", "doc_id", "page")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    // A: nav 4/4 strip; promo 2/4 == half (2*2 >= 4) strip; rare 1/4 keep
    assert(bp("A") === Set("NAV A", "PROMO A"))
    // B: its nav 2/2; A's nav shows once on B (minDocs floor keeps it)
    assert(bp("B") === Set("NAV B"))
  }

  test("strip preserves order, keeps per-source scoping, empty-page safe") {
    val bp = Hygiene.boilerplateTable(pages, "source", "doc_id", "page")
    val out = Hygiene.stripBoilerplate(pages, bp, "source", "doc_id", "page")
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(3L) === ((4, 2, "content three\nRARE A")))
    assert(out(5L) === ((3, 2, "content five\nNAV A"))) // A's nav not bp on B
    assert(out(2L) === ((2, 1, "content two")))
  }

  test("a page of pure boilerplate comes back empty, not NULL") {
    val p = pages.union(Seq((7L, "A", "NAV A")).toDF("doc_id", "source", "page"))
    val bp = Hygiene.boilerplateTable(p, "source", "doc_id", "page")
    val r = Hygiene.stripBoilerplate(p, bp, "source", "doc_id", "page")
      .where($"doc" === 7L).collect().head
    assert(r.getInt(3) === 0 && r.getString(4) === "")
  }

  test("hashed-key path equals the plain-line path") {
    val plainBp = Hygiene.boilerplateTable(pages, "source", "doc_id", "page")
    val hashBp = Hygiene.boilerplateTable(pages, "source", "doc_id", "page",
      hashLines = true)
    val plain = Hygiene.stripBoilerplate(pages, plainBp, "source", "doc_id", "page")
    val hashed = Hygiene.stripBoilerplate(pages, hashBp, "source", "doc_id", "page",
      hashLines = true)
    assert(plain.exceptAll(hashed).isEmpty && hashed.exceptAll(plain).isEmpty,
      "xxhash64 line keys must not change any verdict")
  }

  test("a line repeated inside ONE doc counts once toward its df") {
    val p = Seq(
      (1L, "A", "DUP\nDUP\nDUP\nx"),
      (2L, "A", "y"), (3L, "A", "z"), (4L, "A", "w")
    ).toDF("doc_id", "source", "page")
    val bp = Hygiene.boilerplateTable(p, "source", "doc_id", "page").collect()
    assert(bp.isEmpty, "1/4 docs is below both floors even with 3 in-doc copies")
  }

  test("confusable skeleton folds homoglyphs that exact and canonical keys miss") {
    graft.functions.NfcNormalize.register(spark)
    val df = Seq(
      (1L, "scam alert"),
      (2L, "sсаm alert"), // Cyrillic с/а — renders identically
      (3L, "SCAM alert"),           // case variant: same skeleton too
      (4L, "spam alert")            // genuinely different
    ).toDF("id", "t")
    val keys = df.select($"id",
      md5(graft.ops.Hygiene.confusableSkeleton($"t")).as("k"),
      md5($"t").as("exact"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(keys(1L)._1 === keys(2L)._1, "homoglyph twin must share the skeleton")
    assert(keys(1L)._1 === keys(3L)._1, "case variant must share the skeleton")
    assert(keys(1L)._1 !== keys(4L)._1)
    assert(keys(1L)._2 !== keys(2L)._2, "exact digest must MISS the homoglyph twin")
  }

  // ---- secrets ----

  test("entropy gate: random-shaped key detected, padding and hex survive") {
    val df = Seq(
      // mixed-class, 28 chars, high entropy -> SECRET
      (1L, "use Sk9_A7fB2cD4eF6a8B1c9D3e okay"),
      // mixed-class but low entropy (repeated padding) -> survives
      (2L, "use Aa1_xxxxxxxxxxxxxxxxxxxxxxxx okay"),
      // high entropy but single-case hex (no upper) -> not a candidate
      (3L, "use 9f86d081884c7d659a2feaa0c55ad015 okay"),
      // natural long word (no digit) -> not a candidate
      (4L, "use Incomprehensibilities_Galore okay")
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      size(Hygiene.secretCandidates("text")).as("cand"),
      size(Hygiene.secretTokens("text")).as("sec"),
      Hygiene.redactSecrets("text").as("red"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L)._1 === 1 && out(1L)._2 === 1)
    assert(out(1L)._3 === "use [SECRET] okay")
    assert(out(2L) === ((1, 0, "use Aa1_xxxxxxxxxxxxxxxxxxxxxxxx okay")))
    assert(out(3L)._1 === 0 && out(4L)._1 === 0)
  }

  test("entropy micro-bits match a hand computation") {
    // token 'AAbb11CC' (len 8): three chars x2... compute for 'AAbb1122':
    // 4 distinct chars, each 2/8 -> H = 4 * (0.25 * 2) = 2 bits exactly
    val df = Seq((1L, "pad AAbb1122AAbb1122AAbb1122 pad")).toDF("id", "text")
    // 24-char token of 4 distinct chars each 6/24 -> H = 2.0 bits < 3.0
    val n = df.select(size(Hygiene.secretTokens("text")).as("n")).head.getInt(0)
    assert(n === 0, "exactly-2-bit token must be below the 3-bit gate")
    // and the same token passes a 2.0-bit gate set exactly AT its entropy
    val n2 = df.select(size(Hygiene.secretTokens("text",
      minMicroBits = 2000000L)).as("n")).head.getInt(0)
    assert(n2 === 1, ">= comparison at the exact boundary must admit")
  }

  test("native secret_scan kernel is bit-identical to the HOF spelling") {
    val r = new scala.util.Random(31)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_-éπ. "
    val rows = (0 until 400).map { i =>
      // random token soup, plus planted fixture shapes at several lengths
      val soup = (0 until 12).map(_ =>
        (0 until (1 + r.nextInt(30))).map(_ => alpha(r.nextInt(alpha.length)))
          .mkString).mkString(" ")
      val planted = i % 4 match {
        case 0 => " Sk9_A7fB2cD4eF6a8B1c9D3e"
        case 1 => " Aa1_xxxxxxxxxxxxxxxxxxxxxxxx"
        case 2 => " AAbb1122AAbb1122AAbb1122"
        case _ => ""
      }
      (i.toLong, soup + planted)
    }
    val df = spark.createDataFrame(rows).toDF("id", "text")
    val hof = df
      .withColumn("cands", graft.ops.Hygiene.secretCandidates("text"))
      .withColumn("secrets", graft.ops.Hygiene.secretTokensFrom("cands"))
      .select($"id", $"cands", $"secrets")
    val native = df
      .withColumn("sc", graft.functions.SecretScan(spark, $"text"))
      .select($"id", $"sc.cands".as("cands"), $"sc.secrets".as("secrets"))
    assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty,
      "kernel must reproduce the HOF candidates AND secrets exactly")
  }

  test("multiple distinct secrets all redact; fold order is content-stable") {
    val df = Seq((1L,
      "k1 Sk9_A7fB2cD4eF6a8B1c9D3e mid Qz8_Z1xY3wV5uT7sR9qP2oN4 end"))
      .toDF("id", "text")
    val red = df.select(Hygiene.redactSecrets("text").as("r")).head.getString(0)
    assert(red === "k1 [SECRET] mid [SECRET] end")
  }
}
