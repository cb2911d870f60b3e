package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity gate for the fast Round6 against the BigDecimal reference
  * (Spark's round(x, 6) semantics): every ANN score and every IVF/PQ cell
  * assignment keys on this value, so any divergence shifts codes and
  * breaks the p19/p52/p62/p64/p136 oracles.
  */
class Round6Spec extends AnyFunSuite {

  private def reference(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def check(d: Double): Unit = {
    val got = graft.functions.Round6(d)
    val want = reference(d)
    assert(java.lang.Double.compare(got, want) == 0 ||
      (got == 0.0 && want == 0.0),
      s"Round6($d): got $got want $want")
  }

  test("exact halves, short decimals, zeros, signs") {
    for (d <- Seq(0.0, -0.0, 0.0000005, -0.0000005, 0.0000015, 1.0,
        2.0, 0.05, 0.1234565, -0.1234565, 0.12345649999, 0.1234575,
        1.9999995, -1.9999995, 123456.7891234, 1e-7, -1e-7, 1e-9,
        0.9999994999999999, 0.9999995, 1e15, -1e15, 4.4e9, 7.2e12))
      check(d)
  }

  test("NaN and infinities pass through") {
    assert(graft.functions.Round6(Double.NaN).isNaN)
    assert(graft.functions.Round6(Double.PositiveInfinity).isPosInfinity)
    assert(graft.functions.Round6(Double.NegativeInfinity).isNegInfinity)
  }

  test("random doubles across magnitudes agree with BigDecimal") {
    val rnd = new scala.util.Random(1234)
    var i = 0
    while (i < 2000000) {
      // mix raw-bits randomness with magnitude-targeted values around the
      // interesting range of squared distances
      val d = (i % 4) match {
        case 0 => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case x if x.isNaN || x.isInfinite => 1.0
          case x => x
        }
        case 1 => rnd.nextDouble() * 4.0 // typical distance range
        case 2 => (rnd.nextInt(20000001) - 10000000) / 1e7 // short decimals
        case _ => rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 6)
      }
      check(d)
      i += 1
    }
  }

  test("values straddling rounding boundaries") {
    val rnd = new scala.util.Random(99)
    var i = 0
    while (i < 200000) {
      val base = rnd.nextInt(2000000) / 2.0 // k/2 in 1e-6 units: boundary
      val jitter = (rnd.nextInt(21) - 10) * 1e-22
      check(base / 1e6 + jitter)
      i += 1
    }
  }
}
