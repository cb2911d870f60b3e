package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution statistics that stay exact at corpus scale.
  *
  * The naive exact quantile is a global sort — O(n log n) over every row,
  * the single most shuffle-hostile plan there is, which is why Spark ships
  * `percentile_approx`. But pipeline gates ("p99 document length", "median
  * tokens per language") want EXACT answers over columns whose VALUE
  * DOMAIN is small even when the row count is astronomical: token counts,
  * char lengths, quality deciles. For those, the right plan is a
  * value histogram:
  *
  *   1. `groupBy(key, value).count` — one shuffle whose cardinality is
  *      |distinct (key, value)|, not the row count; map-side partial
  *      aggregation collapses each task's rows before anything moves.
  *   2. a running sum over the (tiny) histogram ordered by value, per key;
  *   3. the q-quantile = the smallest value whose cumulative count reaches
  *      `ceil(q * n)` (discrete / lower quantile — `quantile_disc`).
  *
  * At 100 TB of documents the histogram for token counts is a few hundred
  * thousand rows — the window in step 2 runs over per-key groups that fit
  * in one task trivially. Nothing ever sorts the corpus.
  */
object Stats {

  /** Exact discrete quantiles of `valCol` (integral) per `keyCol`.
    *
    * Returns one row per key: key, n (row count), min/max, and one
    * column per requested quantile named by `names` (e.g. "p50").
    * Quantile definition: smallest v with cumCount(v) >= ceil(q*n) —
    * identical to DuckDB's `quantile_disc` for 0 < q <= 1. When the KEY
    * column is itself named `n`, the count column is emitted as
    * `n_rows` so the output schema never carries a duplicate name.
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
                     qs: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // internal columns are __-prefixed so a caller whose key happens to
    // be named v/cnt/cum/n cannot collide; the OUTPUT count column stays
    // `n` (part of the operator's contract)
    val hist = df.groupBy(col(keyCol), col(valCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keyCol).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__n", sum(col("__cnt")).over(Window.partitionBy(keyCol)))
    val aggs =
      qs.map { case (name, q) =>
        min(when(col("__cum") >= ceil(lit(q) * col("__n")), col("__v"))).as(name)
      } ++ Seq(min(col("__v")).as(s"min_$valCol"), max(col("__v")).as(s"max_$valCol"))
    val nOut = if (keyCol == "n") "n_rows" else "n"
    cum.groupBy(col(keyCol), col("__n"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__n", nOut)
  }
}
