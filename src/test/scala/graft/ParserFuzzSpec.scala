package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mutation-robustness gate for the round-13 parser estate: every
  * byte-level extractor must treat ARBITRARY corruption as data —
  * `Some` (the mutation missed anything load-bearing) or `None`
  * (refusal) — and never escape an exception, hang, or allocate
  * unboundedly. Crawl corpora deliver truncated and bit-flipped files
  * constantly; an extractor that throws on one of them kills the whole
  * executor task, not one row.
  *
  * Deterministic: seeded RNG, fixed mutation counts. Three mutation
  * classes per format: single-byte flips, truncations, and random
  * splices (a block from another seed's fixture).
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val parsers: Seq[(String, Long => Array[Byte], Array[Byte] => Option[Any])] = Seq(
    ("rtf", graft.ops.Rtf.syntheticRtf, graft.ops.Rtf.extractText),
    ("eml", graft.ops.Eml.syntheticEml, graft.ops.Eml.extractEmail),
    ("doc", graft.ops.Doc.syntheticDoc, graft.ops.Doc.extractText),
    ("xls", graft.ops.Xls.syntheticXls, graft.ops.Xls.extractText),
    ("ppt", graft.ops.Ppt.syntheticPpt, graft.ops.Ppt.extractText),
    ("msg", graft.ops.Msg.syntheticMsg, b => graft.ops.Msg.extractMail(b)),
    ("cfb", graft.ops.Doc.syntheticDoc, b => graft.ops.Cfb.read(b)))

  private def run(name: String, bytes: Array[Byte],
                  parse: Array[Byte] => Option[Any], what: String): Unit =
    try { parse(bytes): Unit }
    catch {
      case e: Throwable =>
        fail(s"$name/$what escaped ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  test("bit flips: every parser refuses or survives, never throws") {
    val rnd = new scala.util.Random(13)
    for ((name, fixture, parse) <- parsers; seed <- 0L until 8L) {
      val base = fixture(seed)
      for (_ <- 0 until 40) {
        val m = base.clone()
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
        run(name, m, parse, s"flip@$at seed=$seed")
      }
    }
  }

  test("truncations at every scale never throw") {
    val rnd = new scala.util.Random(17)
    for ((name, fixture, parse) <- parsers; seed <- 0L until 4L) {
      val base = fixture(seed)
      for (_ <- 0 until 20) {
        val n = rnd.nextInt(base.length)
        run(name, java.util.Arrays.copyOf(base, n), parse, s"trunc@$n seed=$seed")
      }
      run(name, Array.empty[Byte], parse, "empty")
    }
  }

  test("cross-seed splices never throw") {
    val rnd = new scala.util.Random(19)
    for ((name, fixture, parse) <- parsers) {
      val a = fixture(2L); val b = fixture(9L)
      for (_ <- 0 until 25) {
        val m = a.clone()
        val len = 1 + rnd.nextInt(64)
        val src = rnd.nextInt(math.max(1, b.length - len))
        val dst = rnd.nextInt(math.max(1, a.length - len))
        System.arraycopy(b, src, m, dst, math.min(len, m.length - dst))
        run(name, m, parse, s"splice@$dst")
      }
    }
  }

  test("garbage prefixed with real magic never throws") {
    val rnd = new scala.util.Random(23)
    for ((name, fixture, parse) <- parsers) {
      val magic = fixture(0L).take(16)
      for (_ <- 0 until 20) {
        val junk = new Array[Byte](64 + rnd.nextInt(512))
        rnd.nextBytes(junk)
        run(name, magic ++ junk, parse, "magic+junk")
      }
    }
  }
}
