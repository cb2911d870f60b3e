package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for heavy-hitter keys.
  *
  * At 100 TB a groupBy on a low-cardinality or Zipf-distributed key sends
  * entire hot keys to single reducers. Two standard remedies, both exact:
  *
  *  - [[saltedAgg]]: two-phase aggregation — partial-aggregate on
  *    (key, salt) so a hot key spreads over `saltFactor` reducers, then
  *    final-aggregate on key. Works for any decomposable aggregate
  *    (sum/count/min/max; avg via sum+count).
  *  - [[saltedJoin]]: replicate the small side `saltFactor` times and salt
  *    the large side's key, so one hot join key fans across reducers.
  *
  * (Spark's AQE skew-join handles the sort-merge case adaptively; these are
  * the explicit forms for aggregations and for when AQE can't see the skew.)
  */
object Skew {

  /** Exact two-phase salted aggregation: sums and counts by `key`, spread
    * over `saltFactor` partial groups. Returns (key, sum_<col>, n).
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
                saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val partial = salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pn"))
    partial
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pn")).as("n"))
  }

  /** Exact salted equi-join: large ⋈ small on `key` with the small side
    * replicated per salt value. Use when one join key dominates the
    * distribution and broadcast isn't possible.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 16): DataFrame = {
    val spark = large.sparkSession
    import spark.implicits._
    val salts = (0 until saltFactor).toDF("_salt")
    val saltedLarge = large.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val replicatedSmall = small.crossJoin(broadcast(salts))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
