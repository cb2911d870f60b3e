package graft.functions

/** Exactly `BigDecimal.valueOf(d).setScale(6, HALF_UP).doubleValue()` —
  * Spark's `round(x, 6)` contract for doubles, which the ANN kernels
  * ([[NearestCells]], [[AdcDistance]]) apply per (row × centroid) — but
  * ~50× faster on the common case. The BigDecimal path stringifies the
  * double and re-parses it (~1 µs); at the p136 scale witness the chain
  * evaluates it billions of times (500 k vectors × 64 centroids × several
  * passes) and it dominated the 6-minute budget.
  *
  * Fast path: `n = round-to-nearest(d·1e6); n / 1e6` in pure double math —
  * exact whenever the decision is not within `margin` of a rounding
  * boundary. Near a boundary (f ≈ 0, 0.5, 1) the fast path could disagree
  * with BigDecimal for two reasons: (a) BigDecimal.valueOf rounds the
  * SHORTEST decimal string of d (within half an ulp of d), (b) `d * 1e6`
  * itself carries up to one ulp of error. Both errors are relatively
  * bounded by ~2⁻⁵²·|y|, so a guard of `1e-6 + |y|·1e-13` (three orders of
  * magnitude of slack) routes every ambiguous case — including exact .5
  * halves and short decimals — to the reference BigDecimal path.
  * `n / 1e6` equals `BigDecimal(n, 6).doubleValue()` exactly: 1e6 is a
  * representable double, so IEEE division returns the correctly-rounded
  * value of the exact rational n/10⁶, which is also what BigDecimal's
  * correctly-rounded doubleValue returns.
  *
  * Round6Spec pins equality against the BigDecimal reference across
  * magnitudes, signs, exact halves, short decimals, and random bits.
  */
object Round6 {
  def apply(d: Double): Double = {
    // Spark's Round passes NaN/Infinity through unchanged; BigDecimal
    // would throw on them
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return d
    val y = d * 1e6
    val ay = java.lang.Math.abs(y)
    if (ay >= 4.5e15) return slow(d) // beyond exact-integer doubles
    val c = java.lang.Math.floor(y)
    val f = y - c
    val margin = 1e-6 + ay * 1e-13
    if (f < margin || 1.0 - f < margin || java.lang.Math.abs(f - 0.5) < margin)
      slow(d)
    else (if (f > 0.5) c + 1.0 else c) / 1e6
  }

  private def slow(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
