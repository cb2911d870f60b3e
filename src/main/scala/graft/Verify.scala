package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [namePrefix...] — optional prefixes restrict the
    // run to matching queries (local iteration; the driver passes none).
    val sfDir = args(0); val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.exists(n.startsWith) }
    // name order, matching Bench: session-state effects (caches, codegen,
    // JIT) reproduce instead of reshuffling per Map hash
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val path = s"$outDir/$name"
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(path)
        // Witness gate: queries that assert their own invariants expose
        // them as boolean columns (`*_ok`, `matches_*`, `equivalent`). A
        // false (or null) witness is a wrong answer — wipe the dump and
        // fail the row so the driver records a hard err instead of
        // archiving a regression as rows-green.
        val written = spark.read.parquet(path)
        checkWitness(written).foreach { msg =>
          deleteRecursively(new java.io.File(path))
          throw new IllegalStateException(msg)
        }
        System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // drop per-query persisted intermediates (see Bench) so suite-wide
        // cache pressure can't tax later queries
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Witness gate (VerifySpec): queries that assert their own invariants
    * expose them as boolean columns (`*_ok`, `matches_*`, `equivalent`). A
    * false (or null) witness is a wrong answer — the caller wipes the dump
    * and fails the row so the driver records a hard err instead of
    * archiving a regression as rows-green. Returns the failure message, or
    * None when every witness holds (or none exist).
    */
  def checkWitness(df: org.apache.spark.sql.DataFrame): Option[String] = {
    val witness = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.BooleanType &&
        (f.name.endsWith("_ok") || f.name.startsWith("matches_") ||
          f.name == "equivalent") => f.name
    }
    if (witness.isEmpty) None
    else {
      import org.apache.spark.sql.functions.col
      val nBad = df
        .filter(witness.map(c => col(c).isNull || !col(c)).reduce(_ || _))
        .count()
      if (nBad > 0)
        Some(s"witness column(s) ${witness.mkString(", ")} false on $nBad row(s)")
      else None
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
