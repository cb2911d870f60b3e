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

  /** Per-group KMV distinct estimate over `valueCol`.
    * Output: (groupCol, n_kept, est_distinct) — n_kept < k means exact.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int, saltBuckets: Int = 16): DataFrame = {
    val kept = kminSet(df, groupCol, valueCol, k, saltBuckets)
    val m = M
    kept.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__hk"))
      .select(col(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * m) / col("__hk").cast("double"), 4))
          .as("est_distinct"))
  }

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
