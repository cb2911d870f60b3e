package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** The host's `read_blob(path)` / `read_text(path)` table functions
  * (examples/monaco_end_to_end.sql:24-26; the host docs' file-ingest
  * surface): one row per matched file with (filename, content, size,
  * last_modified).
  *
  * Backed by Spark's `binaryFile` source — a real DataSource scan, so
  * globs fan out across the cluster, file listing is distributed, and
  * nothing materializes on the driver (the 100 TB posture; the host reads
  * on one thread). Columns are projected to the host's names; `read_text`
  * additionally decodes content as UTF-8.
  *
  * `http(s)://` sources are fetched driver-side into a digest-keyed local
  * cache first (same convention as the remote-PBF ingest,
  * routing.RoutingContext.cacheDirFor): Hadoop's HttpFileSystem can open a
  * URL but not list it, and the host's httpfs does the equivalent
  * single-stream read. The reported `filename` stays the original URL.
  */
object ReadBlob {

  private def litString(e: Expression, fn: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn expects a literal path argument")
  }

  private def fetchHttp(url: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    val name = url.substring(url.lastIndexOf('/') + 1) match {
      case "" => "blob"; case n => n
    }
    val cached = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-blob-$digest-$name")
    if (!java.nio.file.Files.exists(cached)) {
      // download to a scratch name and move atomically, so an interrupted
      // transfer can never leave a truncated file at the cache path
      val tmp = java.nio.file.Paths.get(cached.toString +
        s".${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      val in = java.net.URI.create(url).toURL.openStream()
      try {
        java.nio.file.Files.copy(in, tmp)
        java.nio.file.Files.move(tmp, cached,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally {
        in.close()
        java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    cached.toString
  }

  private def plan(spark: SparkSession, path: String, asText: Boolean): LogicalPlan = {
    val isHttp = path.startsWith("http://") || path.startsWith("https://")
    val local = if (isHttp) fetchHttp(path) else path
    val contentExpr =
      if (asText) "CAST(content AS STRING) AS content" else "content"
    val nameExpr =
      if (isHttp) s"'${path.replace("'", "''")}' AS filename" else "path AS filename"
    spark.read.format("binaryFile").load(local)
      .selectExpr(nameExpr, contentExpr, "length AS size",
        "modificationTime AS last_modified")
      .queryExecution.analyzed
  }

  private def builder(fn: String, asText: Boolean): Seq[Expression] => LogicalPlan =
    exprs => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"$fn expects 1 argument, got ${exprs.length}")
      val spark = SparkSession.getActiveSession.getOrElse(
        throw new IllegalStateException("no active SparkSession"))
      plan(spark, litString(exprs.head, fn), asText)
    }

  val blobBuilder: Seq[Expression] => LogicalPlan = builder("read_blob", asText = false)
  val textBuilder: Seq[Expression] => LogicalPlan = builder("read_text", asText = true)

  /** Per-session install (the zero-code path is GraftExtensions). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "read_blob", blobBuilder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "read_text", textBuilder, "scala_udf")
  }
}
