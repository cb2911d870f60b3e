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
      // The events table's `ts` physical type has varied across driver
      // regenerations: TIMESTAMP(NANOS) (which Spark's vectorized reader
      // rejects — read as long nanos via the legacy conf and convert, the
      // values are µs-precision) vs TIMESTAMP(MICROS) (reads natively as
      // TIMESTAMP_NTZ). Normalize both to session-TZ TIMESTAMP (the session
      // runs UTC, so the NTZ→LTZ cast is value-identical) so every consumer
      // sees one stable type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", normalizedTs(raw))
    } else spark.read.parquet(s"$dir/$name.parquet")

  def normalizedTs(raw: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case _                                   => col("ts").cast("timestamp")
    }
  }
}
