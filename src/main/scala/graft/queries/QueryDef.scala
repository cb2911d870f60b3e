package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable operator: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables. Column
  * names must match between the two — the driver sorts columns by name
  * before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The events table stores TIMESTAMP(NANOS) parquet, which Spark's
      // vectorized reader rejects. Values are µs-precision (verified against
      // the generator output), so read nanos as long and convert losslessly.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
