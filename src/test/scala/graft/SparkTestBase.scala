package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (JVM-wide; specs run
  * in one forked JVM under `Test / fork := true`).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // a whole-stage codegen compile failure (e.g. a method past Janino's
      // 64 KB limit) must FAIL the suite, not silently run interpreted —
      // the suite-wide arm of CodegenSweepSpec's per-query gate
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
