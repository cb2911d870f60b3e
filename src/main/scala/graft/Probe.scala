package graft
import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    def run(name: String): Unit = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).count()
      System.err.println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    args.foreach(run)
  }
}
