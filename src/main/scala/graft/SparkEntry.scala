package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Advanced, Relational, Pipeline, Routing}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator surface is assembled from three suites:
  *  - [[graft.queries.Relational]] — SURVEY §2B host-engine constructs,
  *    each with an exact DuckDB oracle;
  *  - [[graft.queries.Pipeline]] — training-data pipeline ops (dedup,
  *    similarity, text analysis), each with an exact DuckDB oracle;
  *  - [[graft.queries.Routing]] — SURVEY §2A routing operators over the
  *    deterministic grid fixture (not SQL-expressible in DuckDB → rows-only
  *    driver check; exact goldens live in the ScalaTest suite instead).
  */
object SparkEntry {
  private def allDefs = Relational.defs ++ Pipeline.defs ++ Routing.defs ++ Advanced.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
