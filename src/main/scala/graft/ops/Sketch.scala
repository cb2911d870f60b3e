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

  /** Per-group KMV distinct estimate over `valueCol`.
    * Output: (groupCol, n_kept, est_distinct) — n_kept < k means exact.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int, saltBuckets: Int = 16): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = df
      .select(col(groupCol), hash60(col(valueCol)).as("__h"))
      .distinct()
    // stage 1: bounded top-k inside each (group, salt) bucket — caps what
    // stage 2 must sort at saltBuckets·k rows per group
    val wSalt = Window.partitionBy(col(groupCol), pmod(col("__h"), lit(saltBuckets)))
      .orderBy(col("__h").asc)
    val wGroup = Window.partitionBy(col(groupCol)).orderBy(col("__h").asc)
    val kept = hashed
      .withColumn("__rs", row_number().over(wSalt)).filter(col("__rs") <= k)
      .withColumn("__r", row_number().over(wGroup)).filter(col("__r") <= k)
    val m = math.pow(2, 60) // hash60 is uniform on [0, 2^60)
    kept.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__hk"))
      .select(col(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * m) / col("__hk").cast("double"), 4))
          .as("est_distinct"))
  }
}
