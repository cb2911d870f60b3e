package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketching: KMV (k-minimum-values).
  *
  * The KMV estimator keeps the k smallest hash values of a set; if the
  * hashes are uniform on [0, M), the k-th smallest h_k estimates density
  * and distinct-count ≈ (k-1) · M / h_k. Groups holding fewer than k
  * distinct hashes are EXACT (the sketch contains the whole set). Unlike
  * HLL, every step is deterministic and plain SQL — so the estimate itself
  * has an exact cross-engine oracle, and two sketches union by merging
  * min-heaps (the same property DataSketches' theta sketch exploits).
  *
  * Scale shape: the candidate set is cut per group to k rows per salt
  * bucket FIRST (a bounded per-bucket top-k), so the final per-group sort
  * ranks at most saltBuckets·k rows — a giant group never funnels its full
  * distinct stream through one task's sort. Everything upstream is
  * HashAggregate (the distinct) with map-side partials.
  */
object Sketch {

  /** 60-bit md5 prefix — the repo's cross-engine hash contract (numeric so
    * aggregates stay fixed-width; mirrored in DuckDB as
    * CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val M = math.pow(2, 60) // hash60 is uniform on [0, 2^60)

  /** The k smallest distinct hashes per group — the KMV sketch itself, as
    * rows (groupCol, __h). Two-stage bounded top-k: a salt-bucket pre-cut
    * caps the final per-group sort at saltBuckets·k rows (see class note).
    */
  private def kminSet(df: DataFrame, groupCol: String, valueCol: String,
                      k: Int, saltBuckets: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = df
      .select(col(groupCol), hash60(col(valueCol)).as("__h"))
      .distinct()
    val wSalt = Window.partitionBy(col(groupCol), pmod(col("__h"), lit(saltBuckets)))
      .orderBy(col("__h").asc)
    val wGroup = Window.partitionBy(col(groupCol)).orderBy(col("__h").asc)
    hashed
      .withColumn("__rs", row_number().over(wSalt)).filter(col("__rs") <= k)
      .withColumn("__r", row_number().over(wGroup)).filter(col("__r") <= k)
      .select(col(groupCol), col("__h"))
  }

  /** Distinct estimate from an already-cut k-min sketch table
    * (groupCol, __h rows) — shared by the batch path and the streaming
    * state twin (s26), so both read the same estimator.
    */
  private[graft] def kmvEstimate(kept: DataFrame, groupCol: String,
                                 k: Int): DataFrame = {
    val m = M
    kept.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__hk"))
      .select(col(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * m) / col("__hk").cast("double"), 4))
          .as("est_distinct"))
  }

  /** Per-group KMV distinct estimate over `valueCol`.
    * Output: (groupCol, n_kept, est_distinct) — n_kept < k means exact.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int, saltBuckets: Int = 16): DataFrame =
    kmvEstimate(kminSet(df, groupCol, valueCol, k, saltBuckets), groupCol, k)

  /** Pairwise set-relationship estimates between per-group value sets, from
    * KMV sketches alone — the theta-sketch estimator family: |A∪B| from the
    * k-th smallest of the merged sketch, Jaccard from the fraction of the
    * merged sketch present in BOTH input sketches, |A∩B| as their product.
    * Pairs where the merged sketch is unsaturated (n_kept < k) are EXACT.
    * Deterministic throughout, so the estimates themselves oracle exactly.
    *
    * Scale shape: after the bounded kminSet cut, everything downstream
    * works on sketches — at most 2k rows per group pair; every join keys on
    * (pair, hash). Work scales with #pairs · k, never with the corpus. This
    * is how corpus-overlap matrices (e.g. which crawl snapshots share
    * content) stay feasible at 100 TB: one pass sketches, pairs compare KBs.
    *
    * Output per unordered pair: (<group>_a, <group>_b, n_kept, est_union,
    * est_jaccard, est_intersection).
    */
  // -------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007) — deterministic, integer-exact
  // -------------------------------------------------------------------

  /** HLL register table over `hash60`: one row per (group, register index)
    * with the max rank `mj` = leading-zero count + 1 of the hash's
    * non-index bits. 60-bit hashes split into p index bits + (60-p) rank
    * bits, so every step stays in BIGINT and the whole sketch — unlike
    * production HLLs that bury registers in opaque bytes — has an exact
    * cross-engine SQL mirror.
    *
    * Scale shape: `groupBy(group, idx).max` runs with map-side partials;
    * a group's sketch is AT MOST 2^p rows (4 KB at p=9) no matter how
    * many values feed it. Sketches MERGE by elementwise max — union the
    * register tables of two corpora/days and re-aggregate; p87 proves
    * merged-vs-direct equality through its `__all` rows.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "HLL needs 4 <= p <= 16")
    val m = 1 << p
    val q1 = 61 - p // max rank: all (60-p) rank bits zero
    val g = groupCols.map(col)
    val w = shiftright(col("__h"), p) // h >= 0, so >> == >>>
    df.select(g :+ hash60(col(valueCol)).as("__h"): _*)
      .select(g :+ col("__h").bitwiseAND(lit((m - 1).toLong)).as("idx")
        :+ when(w === 0L, lit(q1)).otherwise(lit(q1) - length(bin(w))).as("rho"): _*)
      .groupBy(g :+ col("idx"): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /** Distinct-count estimate from an HLL register table. The harmonic sum
    * Σ 2^(-Mj) is carried as the EXACT integer `s_scaled` = Σ 2^(q1-Mj)
    * (empty registers contribute 2^q1 each; ≤ 2^p · 2^q1 = 2^61, inside
    * BIGINT), so the raw-branch estimate is a pure function of integers
    * and bit-identical across engines; the small-range branch is
    * Flajolet's linear counting m·ln(m/V). Output: (groups…, n_hit,
    * v_zero, s_scaled, est_distinct).
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val q1 = 61 - p
    val alpha = m match { // Flajolet's bias-corrected constants
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val g = groupCols.map(col)
    val eRaw = lit(alpha * m * m) * lit(java.lang.Math.scalb(1.0, q1)) /
      col("s_scaled").cast("double")
    // Re-aggregate by max first: a register table unioned from several
    // sketches (the merge path) may hold multiple rows per (group, idx);
    // counting those raw would give n_hit > m and a garbage estimate. The
    // input is already sketch-scale (≤ 2^p rows per group), so this extra
    // HashAggregate is byte-cheap and makes merge-by-union just work.
    registers
      .groupBy(g :+ col("idx"): _*).agg(max(col("mj")).as("mj"))
      .groupBy(g: _*)
      .agg(count(lit(1)).cast("int").as("n_hit"),
        sum(expr(s"shiftleft(cast(1 as bigint), $q1 - mj)")).as("__s0"))
      .select(g :+ col("n_hit") :+ (lit(m) - col("n_hit")).as("v_zero")
        :+ (col("__s0") + (lit(m.toLong) - col("n_hit")) * lit(1L << q1)).as("s_scaled"): _*)
      .select(g :+ col("n_hit") :+ col("v_zero") :+ col("s_scaled")
        :+ round(when(eRaw <= lit(2.5 * m) && col("v_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
          .otherwise(eRaw), 4).as("est_distinct"): _*)
  }

  /** Per-group HLL distinct estimate in one call (register build +
    * estimate); see [[hllRegisters]]/[[hllEstimate]] for the pieces, which
    * split exactly where persisted sketch tables and cross-corpus merges
    * slot in.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  p: Int = 9): DataFrame =
    hllEstimate(hllRegisters(df, Seq(groupCol), valueCol, p), Seq(groupCol), p)

  // -------------------------------------------------------------------
  // Equi-width histogram sketch — mergeable quantiles without a sort
  // -------------------------------------------------------------------

  /** Fixed-bin integer histogram over [lo, hi): one row per (group, bin)
    * with an exact BIGINT count — the quantile analogue of [[hllRegisters]].
    * A group's sketch is ≤ `bins` rows no matter the corpus; sketches
    * MERGE by per-bin SUM (union two corpora's tables and re-aggregate),
    * and the whole thing is one map-side-combined HashAggregate — the
    * approximate-quantile shape a 100 TB job can afford, where exact
    * quantiles (p81) pay a shuffle of every distinct value.
    */
  def histogramSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 2 && hi > lo, "histogram needs bins >= 2 and hi > lo")
    val g = groupCols.map(col)
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lit(lo)) / lit(hi - lo) * lit(bins)).cast("int")))
    df.groupBy(g :+ bin.as("bin"): _*).agg(count(lit(1)).as("cnt"))
  }

  /** Interpolated quantile estimates from a histogram sketch. Ranks are
    * EXACT integer arithmetic — q = qnum/qden, target rank
    * ⌈q·n⌉ = (n·qnum + qden − 1) div qden — so the picked bin is engine-
    * exact; only the final within-bin linear interpolation is a double
    * (same two-operand expression both engines). Re-aggregates by SUM
    * first, so merged (unioned) sketch tables just work — the [[hllEstimate]]
    * contract. Output: (groups…, q, n, est_q).
    */
  def histogramQuantiles(hist: DataFrame, groupCols: Seq[String],
                         lo: Double, hi: Double, bins: Int,
                         qs: Seq[(Int, Int, String)]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    val h = hist.groupBy(g :+ col("bin"): _*).agg(sum(col("cnt")).as("cnt"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("bin"))
    val c = h.withColumn("cum", sum(col("cnt")).over(wCum))
    val t = h.groupBy(g: _*).agg(sum(col("cnt")).as("n"))
    val width = (hi - lo) / bins
    val wPick = Window.partitionBy(g :+ col("q"): _*).orderBy(col("bin"))
    c.join(t, groupCols)
      .crossJoin(broadcast(qs.toDF("qnum", "qden", "q")))
      .withColumn("r", expr("(n * qnum + qden - 1) div qden"))
      .filter(col("cum") >= col("r"))
      .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
      .select(g :+ col("q") :+ col("n") :+
        round(lit(lo) + (col("bin") + (col("r") - (col("cum") - col("cnt"))) /
          col("cnt")) * lit(width), 4).as("est_q"): _*)
  }

  // -------------------------------------------------------------------
  // HDR (log-linear) histogram — relative-error quantiles, any range
  // -------------------------------------------------------------------

  /** HDR-histogram-style log-linear bins over POSITIVE integers: bin key =
    * (bit length of v, top-`subBits` bits of v). p89's equi-width grid
    * needs [lo, hi) sized in advance; this sketch covers ANY value range
    * with bounded RELATIVE bin width ≤ 2^-(subBits-1) — the quantile
    * sketch for open-ended domains (doc lengths, token counts, file
    * sizes). Bin assignment is pure integer ops (bit length via the
    * binary-string length both engines expose, then shifts), so it has an
    * exact cross-engine mirror — a ln()-based DDSketch bucket can flip on
    * a last-ulp difference; this can't. Values below 1 clamp to 1.
    *
    * Scale shape: one map-side-combined HashAggregate to ≤
    * 63·2^(subBits-1) + 2^subBits rows per group (~520 at subBits=4)
    * regardless of corpus size; sketches MERGE by bin-SUM ([[hdrQuantiles]]
    * re-aggregates first, so merged tables can't double-count).
    */
  def hdrSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                subBits: Int = 4): DataFrame = {
    require(subBits >= 1 && subBits <= 8, "HDR needs 1 <= subBits <= 8")
    val g = groupCols.map(col)
    df.select(g :+ greatest(col(valueCol).cast("long"), lit(1L)).as("__v"): _*)
      .withColumn("__b", length(bin(col("__v"))).cast("int"))
      .withColumn("__shift", greatest(col("__b") - lit(subBits), lit(0)))
      .withColumn("__sub", expr("shiftright(__v, __shift)"))
      .groupBy(g :+ col("__b").as("b") :+ col("__sub").as("sub"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from an HDR sketch: exact integer rank arithmetic
    * (r = ⌈q·n⌉ as (n·qnum + qden − 1) div qden), cumulative bin walk in
    * (b, sub) order, then ONE double division for the within-bin linear
    * interpolation — the p89 determinism contract. `qs` rows are
    * (numerator, denominator, label). Re-aggregates the sketch first so a
    * UNION of per-corpus sketches (merge-by-SUM) estimates correctly.
    */
  def hdrQuantiles(sketch: DataFrame, groupCols: Seq[String], subBits: Int,
                   qs: Seq[(Int, Int, String)]): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val g = groupCols.map(col)
    val h = sketch.groupBy(g :+ col("b") :+ col("sub"): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("b"), col("sub"))
    val c = h.withColumn("cum", sum(col("cnt")).over(wCum))
    val t = h.groupBy(g: _*).agg(sum(col("cnt")).as("n"))
    val wPick = Window.partitionBy(g :+ col("q"): _*).orderBy(col("b"), col("sub"))
    c.join(t, groupCols)
      .crossJoin(broadcast(qs.toDF("qnum", "qden", "q")))
      .withColumn("r", expr("(n * qnum + qden - 1) div qden"))
      .filter(col("cum") >= col("r"))
      .withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
      .withColumn("__shift", greatest(col("b") - lit(subBits), lit(0)))
      .withColumn("__lower", expr("shiftleft(sub, __shift)"))
      .withColumn("__width", expr("shiftleft(CAST(1 AS BIGINT), __shift)"))
      .select(g :+ col("q") :+ col("n") :+
        round(col("__lower") +
          (col("r") - col("cum") + col("cnt")).cast("double") *
            col("__width") / col("cnt"), 4).as("est_q"): _*)
  }

  // -------------------------------------------------------------------
  // Count-min sketch (Cormode & Muthukrishnan 2005) — heavy hitters
  // -------------------------------------------------------------------

  /** CMS table over `hash60`: `depth` independent rows of `width` integer
    * counters as plain (group, row, col, cnt) rows — every OCCURRENCE of a
    * value increments one cell per row, so point estimates bound true
    * frequencies from above. A group's sketch is ≤ depth·width rows no
    * matter the corpus; sketches MERGE by per-cell SUM. One exploded
    * HashAggregate, map-side combined.
    */
  def cmsSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "CMS needs depth >= 1, width >= 2")
    val g = groupCols.map(col)
    val cells = array((0 until depth).map(j =>
      struct(lit(j).as("row"),
        pmod(hash60(concat(lit(s"$j|"), col(valueCol))), lit(width.toLong))
          .as("col"))): _*)
    df.select(g :+ explode(cells).as("cell"): _*)
      .groupBy(g :+ col("cell.row").as("row") :+ col("cell.col").as("col"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a CMS table: est(q) = min over rows of
    * the addressed cell (absent cell = 0). Work scales with
    * groups × queries × depth — never the corpus. Re-aggregates by SUM
    * first so merged sketch tables just work. Output: (groups…, q, est).
    */
  def cmsEstimate(cms: DataFrame, groupCols: Seq[String], queries: DataFrame,
                  depth: Int, width: Int): DataFrame = {
    val g = groupCols.map(col)
    val merged = cms.groupBy(g :+ col("row") :+ col("col"): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val cells = array((0 until depth).map(j =>
      struct(lit(j).as("row"),
        pmod(hash60(concat(lit(s"$j|"), col("q"))), lit(width.toLong))
          .as("col"))): _*)
    val probes = merged.select(g: _*).distinct()
      .crossJoin(broadcast(queries))
      .select(g :+ col("q") :+ explode(cells).as("cell"): _*)
      .select(g :+ col("q") :+ col("cell.row").as("row")
        :+ col("cell.col").as("col"): _*)
    probes.join(merged, groupCols :+ "row" :+ "col", "left")
      .groupBy(g :+ col("q"): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  def kmvSetOps(df: DataFrame, groupCol: String, valueCol: String,
                k: Int, saltBuckets: Int = 16): DataFrame = {
    val kept = kminSet(df, groupCol, valueCol, k, saltBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aRows = kept.select(col(groupCol).as("__ga"), col("__h"))
    val bRows = kept.select(col(groupCol).as("__gb"), col("__h"))
    // the group list and the pair matrix are sketch-scale (G, G² rows of
    // bare keys) — broadcast explicitly so no stage ever shuffles on them
    val groups = kept.select(col(groupCol).as("__g")).distinct()
    val pairs = groups.select(col("__g").as("__ga"))
      .crossJoin(broadcast(groups.select(col("__g").as("__gb"))))
      .filter(col("__ga") < col("__gb"))
    // merged hash set per pair (equal hash ⇒ same value); k smallest kept
    val unioned = aRows.join(broadcast(pairs), "__ga").select("__ga", "__gb", "__h")
      .union(bRows.join(broadcast(pairs), "__gb").select("__ga", "__gb", "__h"))
      .distinct()
    val wPair = Window.partitionBy(col("__ga"), col("__gb")).orderBy(col("__h").asc)
    val uk = unioned.withColumn("__r", row_number().over(wPair)).filter(col("__r") <= k)
    val flagged = uk
      .join(broadcast(aRows.withColumn("__ina", lit(1))), Seq("__ga", "__h"), "left")
      .join(broadcast(bRows.withColumn("__inb", lit(1))), Seq("__gb", "__h"), "left")
    val agg = flagged.groupBy(col("__ga"), col("__gb"))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__theta"),
        sum(when(col("__ina") === 1 && col("__inb") === 1, 1L).otherwise(0L)).as("__nboth"))
    val uRaw = when(col("n_kept") < k, col("n_kept").cast("double"))
      .otherwise(lit((k - 1).toDouble * M) / col("__theta").cast("double"))
    val jRaw = col("__nboth").cast("double") / col("n_kept")
    agg.select(
      col("__ga").as(s"${groupCol}_a"), col("__gb").as(s"${groupCol}_b"),
      col("n_kept"),
      round(uRaw, 4).as("est_union"),
      round(jRaw, 4).as("est_jaccard"),
      round(jRaw * uRaw, 2).as("est_intersection"))
  }
}
