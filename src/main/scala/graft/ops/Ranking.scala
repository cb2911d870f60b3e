package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global order statistics WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` and `sum() OVER (ORDER BY … ROWS
  * UNBOUNDED PRECEDING)` with no PARTITION BY collapse the whole dataset
  * onto one reducer in Spark — the canonical scale-killer for "export the
  * corpus in curriculum order" and "pack shards to a token budget" jobs.
  * The distributed form splits the order into a BUCKET prefix (the leading
  * order column) and a TIE suffix:
  *
  *   1. per-bucket counts/sums — one map-side-combined aggregate down to
  *      bucket-scale rows;
  *   2. exclusive offsets over the bucket table — a window over the
  *      bucket-scale table only (sketch-table contract: bounded rows, not
  *      corpus rows);
  *   3. broadcast the offsets back and finish each bucket independently
  *      with a PARTITION BY bucket window.
  *
  * Total corpus-scale work: one aggregate + one bucket-partitioned window;
  * the only global step runs on the bounded bucket table. The bucket
  * column must have a bounded distinct domain (a score, a length, a coarse
  * `id div C` stripe — pick C so N/C offsets fit a broadcast; chain two
  * levels for more headroom).
  */
object Ranking {

  /** Appends `rankCol` = the exact 1-based global row number of the total
    * order (`bucketCol` asc, then `tieCols` asc), and — when `valueCol` is
    * set — `cumCol` = the inclusive prefix sum of `valueCol` in that same
    * order. `bucketCol` values must be NON-NULL (engines disagree on null
    * ordering) and the input must not already carry `__b`/`__rank_off`/
    * `__sum_off` columns.
    */
  def withGlobalOrder(df: DataFrame, bucketCol: String, tieCols: Seq[String],
                      rankCol: String, valueCol: Option[String] = None,
                      cumCol: String = "cum"): DataFrame = {
    val b = col(bucketCol)
    val aggs = count(lit(1)).as("__n") +:
      valueCol.map(v => sum(col(v)).as("__s")).toSeq
    val perBucket = df.select((b.as("__b") +: valueCol.map(col).toSeq): _*)
      .groupBy(col("__b")).agg(aggs.head, aggs.tail: _*)
    // the one global window — over BUCKET-scale rows only
    val wB = Window.orderBy(col("__b"))
    val offsets0 = perBucket
      .withColumn("__rank_off", sum(col("__n")).over(wB) - col("__n"))
    val offsets = valueCol.fold(offsets0)(_ =>
      offsets0.withColumn("__sum_off", sum(col("__s")).over(wB) - col("__s")))
    val wIn = Window.partitionBy(b).orderBy(tieCols.map(col): _*)
    val joined = df.join(broadcast(offsets.drop("__n", "__s")),
      b === col("__b"))
    val ranked = joined
      .withColumn(rankCol, col("__rank_off") + row_number().over(wIn))
    valueCol.fold(ranked)(v =>
        ranked.withColumn(cumCol, col("__sum_off") + sum(col(v)).over(wIn)))
      .drop("__b", "__rank_off", "__sum_off")
  }

  /** Shard assignment for a rank-ordered export into `k` equal-depth
    * shards: rows `rank ∈ [1, n]` map to `floor((rank-1)·k / n)` — exactly
    * SQL's `ntile(k)` boundaries when n is divisible by k, and within one
    * row of them otherwise (deterministic either way, unlike ntile's
    * engine-specific remainder placement).
    */
  def shardByRank(rank: Column, k: Int, n: Column): Column =
    floor((rank - 1) * k / n).cast("int")

  /** Shard assignment for budget packing: documents in a fixed total order
    * fill shard `floor((cum - value) / budget)` — the shard its FIRST byte
    * lands in, so every shard holds ≤ budget units unless a single row
    * alone exceeds the budget (which then occupies its shard(s) alone).
    */
  def shardByBudget(cum: Column, value: Column, budget: Long): Column =
    floor((cum - value) / budget).cast("int")
}
