package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side levers that make 100 TB reads
  * cheap. Parquet pruning (min/max row-group stats, partition pruning)
  * only pays off when nearby rows are nearby in key space — Z-ordering
  * provides that for MULTI-column predicates where a lexicographic sort
  * favors only its leading column.
  */
object Layout {

  /** Morton (Z-order) value of two non-negative int columns, `bits` low
    * bits each, bit-interleaved (a even positions, b odd). Pure integer
    * arithmetic — whole-stage codegen, no UDF — so a writer can
    * `.repartitionByRange(col)` / `.sortWithinPartitions(col)` on it at
    * any scale. Interleaving gives locality in BOTH dimensions: a range
    * of z-values bounds a rectangle in (a, b) space, which is what makes
    * min/max row-group stats selective for predicates on either column.
    */
  def zOrder2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits per dimension must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same interleave as ANSI SQL text (for the DuckDB oracle and any
    * SQL-only consumer): keep the two implementations trivially parallel.
    */
  def zOrder2Sql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Cluster `df` for multi-column locality: range-partition by the
    * z-value into `numFiles` output partitions and sort within each — the
    * standard OPTIMIZE ZORDER BY shape. Each output file then covers a
    * compact z-range = a bounded rectangle of the two key domains, so
    * row-group stats prune reads for predicates on either key.
    */
  def clusterByZ(df: DataFrame, a: Column, b: Column, bits: Int,
                 numFiles: Int): DataFrame = {
    val z = zOrder2(a, b, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
