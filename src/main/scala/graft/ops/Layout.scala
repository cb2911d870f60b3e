package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side levers that make 100 TB reads
  * cheap. Parquet pruning (min/max row-group stats, partition pruning)
  * only pays off when nearby rows are nearby in key space — Z-ordering
  * provides that for MULTI-column predicates where a lexicographic sort
  * favors only its leading column.
  */
object Layout {

  /** Morton (Z-order) value of two non-negative int columns, `bits` low
    * bits each, bit-interleaved (a even positions, b odd). Pure integer
    * arithmetic — whole-stage codegen, no UDF — so a writer can
    * `.repartitionByRange(col)` / `.sortWithinPartitions(col)` on it at
    * any scale. Interleaving gives locality in BOTH dimensions: a range
    * of z-values bounds a rectangle in (a, b) space, which is what makes
    * min/max row-group stats selective for predicates on either column.
    */
  def zOrder2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits per dimension must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same interleave as ANSI SQL text (for the DuckDB oracle and any
    * SQL-only consumer): keep the two implementations trivially parallel.
    */
  def zOrder2Sql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Cluster `df` for multi-column locality: range-partition by the
    * z-value into `numFiles` output partitions and sort within each — the
    * standard OPTIMIZE ZORDER BY shape. Each output file then covers a
    * compact z-range = a bounded rectangle of the two key domains, so
    * row-group stats prune reads for predicates on either key.
    */
  def clusterByZ(df: DataFrame, a: Column, b: Column, bits: Int,
                 numFiles: Int): DataFrame = {
    val z = zOrder2(a, b, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Deterministic training-shard writer + manifest — the last step of a
    * training-data pipeline: materialize the corpus as N stable shards and
    * emit per-shard accounting a downstream loader can trust. Shard
    * assignment is the 28-bit md5 prefix of the document id mod `nShards`
    * (a pure per-row expression — retry- and engine-reproducible, unlike
    * round-robin), the write is ONE hash repartition on the shard key with
    * parallel per-shard writer tasks, and the manifest is computed FROM THE
    * WRITTEN FILES — doc/word/char counts plus an order-independent
    * integrity digest (sum of per-doc 30-bit md5(doc_id|text) prefixes;
    * bounded terms keep a BIGINT sum exact past 10^9 rows per shard).
    * `counts_match` compares the read-back manifest against the pre-write
    * plan row-for-row; Verify hard-fails any false witness column.
    *
    * 100 TB shape: no collects, no windows — two map-side-combined
    * HashAggregates (pre-write and read-back) plus the shard-keyed
    * exchange the write itself requires. If one shard outgrows a single
    * writer task, salt the repartition key (shard, salt) and keep
    * `partitionBy(shard)` — the directory layout is unchanged.
    *
    * `outPath`: where the shards land, resolved through the Hadoop
    * FileSystem API — so `hdfs://…` / `s3a://…` work exactly like a local
    * path, and executors and driver agree on the target (ADVICE r4: a
    * driver-local temp dir only works when driver and executors share a
    * filesystem). When given, the written shards are KEPT (they are the
    * product; the manifest is the receipt) and served lazily from the
    * written files. When None (verification/harness runs, local mode),
    * a driver-local temp dir is used and deleted after the manifest
    * materializes — explicitly a shared-filesystem-only convenience.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    nShards: Int, outPath: Option[String] = None): DataFrame = {
    val staged = df.select(
      col(idCol).cast("long").as("doc_id"), col(textCol).as("text"),
      (conv(substring(md5(col(idCol).cast("string")), 1, 7), 16, 10)
        .cast("long") % nShards).as("shard"))
    def manifest(src: DataFrame): DataFrame = {
      val dg = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit("|"), col("text"))), 1, 15),
        16, 10).cast("long") % 1073741824L
      src.groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.ops.TextOps.wordCount(col("text")).cast("long")).as("n_words"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(dg).as("digest"))
    }
    val keepOutput = outPath.isDefined
    val dir = outPath.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-shards").toString)
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    try {
      staged.repartition(nShards, col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(dir)
      val cols = Seq("n_docs", "n_words", "n_chars", "digest")
      val planned = manifest(staged)
        .select(col("shard") +: cols.map(c => col(c).as(s"p_$c")): _*)
      val written = manifest(spark.read.parquet(dir))
      val matches = cols.map(c => col(c) === col(s"p_$c")).reduce(_ && _)
      val result = written.join(planned, "shard")
        .withColumn("counts_match", matches.cast("int"))
        .select(col("shard"), col("n_docs"), col("n_words"), col("n_chars"),
          col("digest"), col("counts_match"))
        .orderBy(col("shard"))
      // temp-dir mode: materialize before the finally deletes the parquet
      // under the scan; persistent mode: stay lazy, the files are durable
      if (keepOutput) result else result.localCheckpoint(true)
    } finally {
      if (!keepOutput) { fs.delete(hPath, true): Unit }
    }
  }

  /** Size-tiered compaction planning over a file listing — the table-
    * maintenance pass every long-lived 100 TB table needs (streaming
    * sinks, incremental appends and shard retries all accrete small
    * files until scans drown in open/seek overhead; this is the planner
    * behind an OPTIMIZE/auto-compaction service).
    *
    * Deterministic rule, chosen so the plan is a PURE windowed expression
    * (identical on any engine, no driver-side loop): per directory,
    * files under `targetBytes` are candidates, ordered (size DESC,
    * file ASC); a candidate's bin is its exclusive running-sum of
    * candidate sizes integer-divided by the target — so every bin's
    * total lands within one member's size of the target on BOTH sides
    * (over by at most its own largest member, under by at most the
    * previous bin's overshoot), and first-fit-decreasing-style
    * big-with-small mixing falls out of the ordering.
    * Files at/over target, and bins left with a single member (nothing
    * to merge with), are `keep`.
    *
    * Scale shape: this plans over the LISTING (metadata rows — millions
    * of files, not the petabytes inside them). One hash shuffle on the
    * directory, two window passes over per-directory groups that a
    * single task holds trivially; the rewrite a caller executes from the
    * plan is then partition-pruned per (dir, bin). Exact integer
    * arithmetic end to end (BIGINT running sums, `DIV`), so the plan is
    * hash-identical across engines and retries.
    *
    * @return (dir, file, size, action 'compact'|'keep', bin — NULL on
    *         keep rows; bins number 0.. per directory, not globally)
    */
  def compactionPlan(files: DataFrame, dirCol: String, fileCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.spark.sql.expressions.Window
    // windows and predicates reference the RENAMED columns — the caller's
    // names are gone after the normalizing select below
    val w = Window.partitionBy(col("dir"))
      .orderBy(col("size").desc, col("file").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val small = col("size") < lit(targetBytes)
    val staged = files.select(col(dirCol).as("dir"), col(fileCol).as("file"),
        col(sizeCol).cast("long").as("size"))
      .withColumn("__cumb",
        coalesce(sum(when(small, col("size")).otherwise(lit(0L))).over(w), lit(0L)))
      .withColumn("__bin0", when(small, expr(s"__cumb DIV ${targetBytes}L")))
    val nb = Window.partitionBy(col("dir"), col("__bin0"))
    staged
      .withColumn("__nb", count(lit(1)).over(nb))
      .select(col("dir"), col("file"), col("size"),
        when(col("__bin0").isNotNull && col("__nb") >= 2, lit("compact"))
          .otherwise(lit("keep")).as("action"),
        when(col("__bin0").isNotNull && col("__nb") >= 2, col("__bin0"))
          .cast("long").as("bin"))
  }

  // ---- manifest-pinned snapshots (dataset time travel) ---------------------

  /** Append one snapshot version to a manifest-pinned dataset at `base` —
    * the Iceberg/Delta contract reduced to its load-bearing core, and the
    * property a TRAINING corpus cannot live without: "dataset v1.3" must
    * mean the same bytes forever, even while v1.4 lands beside it.
    *
    *  - Data files are immutable and append-only under `base/data/`
    *    (version-prefixed names; a version never rewrites another
    *    version's files).
    *  - `base/manifests/v{N}.txt` lists EVERY file visible at version N
    *    (the previous manifest's files plus this append), one name per
    *    line — so a reader pins a version by file LIST, never by
    *    directory listing (concurrent appends can't leak into a pinned
    *    read, and nothing is ever copied or rewritten to make a new
    *    version).
    *
    * Returns the new version number (1-based). `filesPerVersion` is the
    * write parallelism knob — at corpus scale this is the shard count of
    * the append, not 2.
    *
    * Writer contract: ONE appender at a time per base (the p101 caller
    * serializes through cachedLayout's lock; the s28 stream commits from
    * a single driver). A racing second appender fails LOUDLY — both
    * compute the same version, and the second data-file/manifest
    * `Files.move` throws on the existing target — it can never silently
    * corrupt a published manifest.
    */
  def appendSnapshot(base: java.nio.file.Path, df: DataFrame,
                     filesPerVersion: Int = 2): Int = {
    import scala.jdk.CollectionConverters._
    val dataDir = base.resolve("data")
    val manDir = base.resolve("manifests")
    java.nio.file.Files.createDirectories(dataDir)
    java.nio.file.Files.createDirectories(manDir)
    val prev = java.nio.file.Files.list(manDir).iterator().asScala.toSeq
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toInt)
      .sorted
    val version = prev.lastOption.getOrElse(0) + 1
    val carried: Seq[String] = prev.lastOption match {
      case Some(pv) =>
        java.nio.file.Files.readAllLines(
          manDir.resolve(s"v$pv.txt")).asScala.toSeq.filter(_.nonEmpty)
      case None => Seq.empty
    }
    // stage the parquet write, then adopt the parts under stable
    // version-prefixed names (file-content assignment across parts is
    // write-order detail; a pinned read always takes the whole set)
    val staging = java.nio.file.Files.createTempDirectory(base, s"stage-v$version")
    df.repartition(filesPerVersion).write.mode("overwrite")
      .parquet(staging.resolve("out").toString)
    val parts = java.nio.file.Files.list(staging.resolve("out")).iterator().asScala
      .toSeq.map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet")).sorted
    val named = parts.zipWithIndex.map { case (p, i) =>
      val name = f"v$version-$i%05d.parquet"
      java.nio.file.Files.move(staging.resolve("out").resolve(p),
        dataDir.resolve(name))
      name
    }
    // clean staging debris (_SUCCESS etc.)
    java.nio.file.Files.walk(staging).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    // manifest commit is the atomic publish point: write-then-move
    val tmp = manDir.resolve(s".v$version.txt.tmp")
    java.nio.file.Files.write(tmp,
      (carried ++ named).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, manDir.resolve(s"v$version.txt"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    version
  }

  /** The file list pinned by manifest `version`. */
  def snapshotFiles(base: java.nio.file.Path, version: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      base.resolve("manifests").resolve(s"v$version.txt"))
      .asScala.toSeq.filter(_.nonEmpty)
      .map(n => base.resolve("data").resolve(n).toString)
  }

  /** Read EXACTLY snapshot `version` — the pinned file list, never the
    * live directory. Reading v1 while v2 lands returns v1's rows,
    * forever.
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   base: java.nio.file.Path, version: Int): DataFrame =
    spark.read.parquet(snapshotFiles(base, version): _*)
}
