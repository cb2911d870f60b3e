package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** The host dialect's `COPY (<query>) TO '<file>' [(options)]` export
  * statement (examples/monaco_pure_sql.sql:93-115,
  * examples/monaco_end_to_end.sql:85-103, ITALY.md:314-334) — one result,
  * one file, exactly where the statement points.
  *
  * Spark's writers produce directories of part files; the host writes ONE
  * file. A single-file export is inherently a single-writer operation, so
  * the plan is `coalesce(1)` → write to a scratch dir next to the target →
  * rename the part file onto the target path (Hadoop FileSystem rename, so
  * any scheme the session can reach works). Large fan-out exports belong to
  * the parquet/csv directory writers; this statement is the host's
  * script-ergonomics surface.
  *
  * Format resolution mirrors the host: an explicit `FORMAT` option wins,
  * else the target extension (`.csv`, `.parquet`, `.json`/`.ndjson`
  * newline-delimited). Anything else — `.geojson`, `.pbf`, `.txt` — writes
  * RAW: the result must be a single column; STRING rows land newline-
  * joined, a BINARY row lands byte-for-byte (that makes the reference's
  * `COPY (SELECT * FROM read_blob(url)) TO 'x.osm.pbf'` download step
  * produce a usable file, where the host's CSV fallback would mangle it —
  * intent over letter, divergence documented). CSV headers default on,
  * like the host's `COPY TO`.
  *
  * The returned row is the host's shape: one BIGINT `Count` of rows
  * exported — counted from what landed (parquet footer / line count /
  * collected rows), never by re-running the query.
  */
object CopyToFile {

  final case class Spec(innerSql: String, target: String,
                        options: Map[String, String])

  /** Execute an export; returns the exported row count. */
  def run(spark: SparkSession, spec: Spec): Long = {
    val df = spark.sql(spec.innerSql)
    val fmt = spec.options.getOrElse("format", formatOf(spec.target)).toLowerCase
    val hconf = spark.sessionState.newHadoopConf()
    val target = new Path(spec.target)
    val fs = target.getFileSystem(hconf)

    fmt match {
      case "csv" | "parquet" | "json" =>
        // a bare relative target ('monaco_route.geojson') has no parent
        val parent = Option(target.getParent).getOrElse(new Path("."))
        val scratch = new Path(parent,
          s".__graft_copy_${target.getName}_${java.util.UUID.randomUUID().toString.take(8)}")
        try {
          val header = spec.options.get("header").forall(_.toLowerCase != "false")
          val writer = df.coalesce(1).write.mode("overwrite")
          val configured = fmt match {
            case "csv" =>
              val w = writer.option("header", header.toString)
              spec.options.get("delimiter").orElse(spec.options.get("sep"))
                .fold(w)(d => w.option("sep", d))
            case _ => writer
          }
          configured.format(if (fmt == "json") "json" else fmt).save(scratch.toString)
          val part = fs.listStatus(scratch)
            .map(_.getPath).find(_.getName.startsWith("part-"))
            .getOrElse(throw new IllegalStateException(
              s"COPY produced no part file under $scratch"))
          if (fs.exists(target)) fs.delete(target, false)
          if (!fs.rename(part, target))
            throw new IllegalStateException(s"COPY could not move $part to $target")
          countWritten(spark, fmt, target, fs, header)
        } finally fs.delete(scratch, true)

      case _ => // raw export: one column, or the one BINARY column of many
        // (`SELECT * FROM read_blob(url)` carries filename/size/mtime
        // alongside content — the blob is what the file gets)
        val cols = df.schema.fields
        val picked =
          if (cols.length == 1) df
          else cols.filter(_.dataType == org.apache.spark.sql.types.BinaryType) match {
            case Array(one) => df.select(df.col(one.name))
            case _ => throw new IllegalArgumentException(
              s"COPY TO ${spec.target}: raw export needs a single column " +
                s"(or exactly one BINARY column), got ${cols.length}")
          }
        // stream partition-by-partition (toLocalIterator): one partition's
        // memory on the driver, not the whole result — a multi-GB blob or
        // large text export writes without a full collect()
        val binary = picked.schema.fields.head.dataType ==
          org.apache.spark.sql.types.BinaryType
        val out = fs.create(target, true)
        var n = 0L
        try {
          val it = picked.toLocalIterator()
          while (it.hasNext) {
            val r = it.next()
            if (binary) {
              if (!r.isNullAt(0)) out.write(r.getAs[Array[Byte]](0))
            } else {
              val line = if (r.isNullAt(0)) "" else String.valueOf(r.get(0))
              out.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              out.write('\n')
            }
            n += 1
          }
        } finally out.close()
        n
    }
  }

  private def formatOf(target: String): String = {
    val name = target.toLowerCase
    if (name.endsWith(".csv")) "csv"
    else if (name.endsWith(".parquet")) "parquet"
    else if (name.endsWith(".json") || name.endsWith(".ndjson") ||
      name.endsWith(".jsonl")) "json"
    else "raw"
  }

  /** Count what landed without re-running the query: parquet row-count from
    * footer metadata, csv by re-parsing the one written file (a quoted
    * value may span physical lines, so line-counting would overcount),
    * json by line count (the writer never splits a record across lines).
    */
  private def countWritten(spark: SparkSession, fmt: String, target: Path,
                           fs: org.apache.hadoop.fs.FileSystem,
                           header: Boolean): Long =
    fmt match {
      case "parquet" => spark.read.parquet(target.toString).count()
      case "csv" =>
        spark.read.option("header", header.toString).option("multiLine", "true")
          .csv(target.toString).count()
      case _ =>
        val in = fs.open(target)
        try {
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
          var n = 0L
          while (reader.readLine() != null) n += 1
          n
        } finally in.close()
    }
}

/** LogicalPlan form for the injected-parser path: `spark.sql("COPY ...")`
  * plans to this command; execution happens at the normal command-execution
  * point (eager, like every Spark DDL/DML command).
  */
case class CopyToFileCommand(spec: CopyToFile.Spec) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("Count", LongType, nullable = false)())
  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(CopyToFile.run(sparkSession, spec)))
}
