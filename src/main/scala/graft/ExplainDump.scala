package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries into plans/<tag>/<name>_<suffix>.txt
  * (the optimization-round evidence contract).
  *
  * Usage: runMain graft.ExplainDump <tag> <suffix> <query> [query...]
  * e.g.   runMain graft.ExplainDump r13 before p48_charlm_quality
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0); val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(s"plans/$tag"))
    for (name <- args.drop(2)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
      println(s"[explain] wrote plans/$tag/${name}_$suffix.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
