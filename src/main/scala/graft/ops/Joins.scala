package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as built-ins but the reference's host engine
  * (DuckDB) ships natively: ASOF JOIN and interval/range joins (DuckDB's
  * IEJoin). Both are re-expressed as compositions of shuffle-exchange +
  * sort/hash primitives Catalyst already optimizes, per the custom-operator
  * preference order (compose > custom plan), so AQE, codegen and partial
  * aggregation all apply downstream.
  *
  * Scale design:
  *  - as-of: ONE shuffle on the key and an in-partition sort — the same
  *    cost as a sort-merge join, with no per-key candidate blowup. The
  *    window is a running `last(..., ignoreNulls)`, evaluated in a single
  *    forward pass (UnboundedPreceding..CurrentRow never buffers the
  *    partition the way following-frames do).
  *  - range: candidate generation via fixed-width bins — a point lands in
  *    exactly one bin, an interval explodes to the bins it overlaps, the
  *    join is a plain equi-join on bin id. Because the point's single bin
  *    meets each overlapping interval exactly once, NO post-join dedup is
  *    needed. Candidate cost is density-bounded (points/bin × intervals/bin
  *    summed over bins), not |points| × |intervals| the way Spark's own
  *    BroadcastNestedLoopJoin fallback for inequality predicates is.
  */
object Joins {

  /** As-of join: for every left row (key, time), attach the right row with
    * the greatest time ≤ left time (or strictly <, with `strict = true`)
    * for the same key — "most recent fact as of this instant".
    *
    * Mechanics: union both sides tagged with a sort rank, partition by key,
    * order by (time, rank) so eligible right rows sort before each left row,
    * and carry right values forward with last(ignoreNulls) over
    * UnboundedPreceding..CurrentRow. Inclusive mode ranks right rows before
    * left rows at the same timestamp (so an equal-time fact is visible);
    * strict mode ranks them after (so it is not).
    *
    * Right rows must be unique per (key, time) for a deterministic result —
    * the same precondition DuckDB's ASOF JOIN leaves unspecified on ties;
    * pre-aggregate the right side if needed.
    *
    * @param rightVals right columns to attach (left keeps ALL its columns)
    * @param inner     drop left rows with no eligible right row (ASOF JOIN)
    *                  vs keep them with nulls (ASOF LEFT JOIN)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightVals: Seq[String],
               strict: Boolean = false, inner: Boolean = true): DataFrame = {
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val (rRank, lRank) = if (strict) (1, 0) else (0, 1)
    val leftCols = left.columns.toSeq
    // union needs identical column types: align the right side's key/time
    // to the left's declared types (e.g. INT event ids vs BIGINT order ids)
    val kType = left.schema(leftKey).dataType
    val tType = left.schema(leftTime).dataType
    val lp = left.select(
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"),
        lit(lRank).as("__r"), lit(null).cast("int").as("__m")) ++
        leftCols.map(col) ++
        rightVals.map(c => lit(null).cast(rightTypes(c)).as(c)): _*)
    val rp = right.select(
      Seq(col(rightKey).cast(kType).as("__k"), col(rightTime).cast(tType).as("__t"),
        lit(rRank).as("__r"), lit(1).as("__m")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lp.union(rp).select(
      Seq(col("__r"), last(col("__m"), ignoreNulls = true).over(w).as("__matched")) ++
        leftCols.map(col) ++
        rightVals.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    val leftRows = filled.filter(col("__r") === lRank)
    val kept = if (inner) leftRows.filter(col("__matched").isNotNull) else leftRows
    kept.select((leftCols ++ rightVals).map(col): _*)
  }

  /** Range (interval) join: pairs every point row with every interval row
    * whose [lo, hi] contains the point's value, via fixed-width bin
    * candidates + exact residual filter. Output: all point columns + all
    * interval columns (names must not collide).
    *
    * `binWidth` trades candidate count for explode factor: each interval
    * produces ceil(width/binWidth)+1 candidate rows; each candidate bucket
    * pairs its points with its intervals. Pick it near the typical interval
    * width so intervals explode to ~2 bins while buckets stay small.
    * Correctness never depends on it — the BETWEEN filter is exact on the
    * original values.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(iv, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
