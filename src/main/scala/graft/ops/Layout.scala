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

  /** Close-safe directory listings — see [[Fs]] (materialize-and-close,
    * so repeated appends can't leak descriptors on the driver).
    */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    Fs.listDir(p)

  private def walkAll(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    Fs.walkAll(p)

  /** One manifest file line: a data-file name plus optional per-column
    * min/max footer stats (`kind` ∈ long | double | string; min/max in
    * canonical string form).
    */
  final case class ManifestEntry(
      name: String, stats: Map[String, (String, String, String)]) {
    private[Layout] def line: String =
      if (stats.isEmpty) name
      else name + "\t" + stats.toSeq.sortBy(_._1).map { case (c, (k, mn, mx)) =>
        s"$c:$k:${Layout.hex(mn)}:${Layout.hex(mx)}"
      }.mkString(";")
  }

  private def hex(s: String): String =
    s.getBytes("UTF-8").map("%02x".format(_)).mkString
  private def unhex(h: String): String =
    new String(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")

  /** Typed comparison for manifest stats values. Strings compare on
    * UNSIGNED UTF-8 bytes — the order parquet footer binary statistics
    * are computed in. Java `String.compareTo` (UTF-16 code units) ranks
    * supplementary characters BELOW U+E000..U+FFFF, the opposite of
    * UTF-8 byte order, so using it against footer-derived min/max could
    * wrongly prune a file that contains matching rows (ADVICE r11).
    */
  private def statCmp(kind: String, a: String, b: String): Int = kind match {
    case "long"   => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _ =>
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(ab(i) & 0xff, bb(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(ab.length, bb.length)
  }

  /** Committed manifest versions at `base`, ascending (empty when none). */
  def snapshotVersions(base: java.nio.file.Path): Seq[Int] = {
    val manDir = base.resolve("manifests")
    if (!java.nio.file.Files.exists(manDir)) Seq.empty
    else listDir(manDir).map(_.getFileName.toString)
      .filter(n => n.matches("v\\d+\\.txt"))
      .map(n => n.stripPrefix("v").stripSuffix(".txt").toInt)
      .sorted
  }

  /** Parse manifest `version`: (committing batchId if stamped, entries).
    * Metadata lines start with `#`; file lines are `name` (legacy) or
    * `name\tcol:kind:minhex:maxhex;…`.
    */
  def readManifest(base: java.nio.file.Path,
                   version: Int): (Option[Long], Seq[ManifestEntry]) = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(
      base.resolve("manifests").resolve(s"v$version.txt"))
      .asScala.toSeq.filter(_.nonEmpty)
    val batch = lines.filter(_.startsWith("#"))
      .flatMap { m =>
        if (m.startsWith("#batch=")) Some(m.stripPrefix("#batch=").toLong)
        else None
      }.headOption
    val entries = lines.filterNot(_.startsWith("#")).map { ln =>
      ln.split('\t') match {
        case Array(n) => ManifestEntry(n, Map.empty)
        case Array(n, st) =>
          ManifestEntry(n, st.split(';').iterator.map { part =>
            val Array(c, k, mn, mx) = part.split(':')
            c -> ((k, unhex(mn), unhex(mx)))
          }.toMap)
        case other => ManifestEntry(other.head, Map.empty)
      }
    }
    (batch, entries)
  }

  /** Per-file min/max column stats read from the parquet FOOTER — the
    * stats come free with the write (no second data scan; at 100 TB the
    * footer read is a few KB per file on the driver, the same cost
    * Iceberg pays to build its manifests). Columns with missing/unusable
    * statistics in ANY block are omitted for that file (pruning then
    * keeps the file — unknown never prunes).
    */
  private def footerStats(file: java.nio.file.Path,
                          cols: Set[String]): Map[String, (String, String, String)] = {
    if (cols.isEmpty) return Map.empty
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri),
      new org.apache.hadoop.conf.Configuration())
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map[String, (String, String, String)]()
      val dropped = scala.collection.mutable.Set[String]()
      for (b <- rd.getFooter.getBlocks.asScala; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (cols.contains(name) && !dropped.contains(name)) {
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) { dropped += name; acc.remove(name) }
          else {
            val typed: Option[(String, String, String)] = st.genericGetMin match {
              case l: java.lang.Long    => Some(("long", l.toString, st.genericGetMax.toString))
              case i: java.lang.Integer => Some(("long", i.toString, st.genericGetMax.toString))
              case d: java.lang.Double  => Some(("double", d.toString, st.genericGetMax.toString))
              case f: java.lang.Float   => Some(("double", f.toString, st.genericGetMax.toString))
              case bin: org.apache.parquet.io.api.Binary =>
                Some(("string", new String(bin.getBytes, "UTF-8"),
                  new String(st.genericGetMax
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes, "UTF-8")))
              case _ => None
            }
            typed match {
              case None => dropped += name; acc.remove(name)
              case Some((k, mn, mx)) => acc.get(name) match {
                case None => acc(name) = (k, mn, mx)
                case Some((k0, m0, m1)) =>
                  acc(name) = (k0,
                    if (statCmp(k0, mn, m0) < 0) mn else m0,
                    if (statCmp(k0, mx, m1) > 0) mx else m1)
              }
            }
          }
        }
      }
      acc.toMap
    } finally rd.close()
  }

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
    * `batchId` is the REPLAY-IDEMPOTENCE key for at-least-once callers
    * (streaming foreachBatch): when the LATEST manifest already carries
    * the same `#batch=` stamp, the append is a replay of an
    * already-committed batch — return that version, write nothing. A
    * crash between the manifest move and the caller's checkpoint commit
    * then re-runs the batch WITHOUT publishing a duplicate version.
    *
    * `statsCols` records per-file min/max (from the parquet footers —
    * no extra scan) into the manifest, the Iceberg-style pruning index
    * [[pruneSnapshotFiles]] consults; `layoutCol` range-partitions the
    * append on that column so the recorded ranges are DISJOINT and a
    * selective read opens O(matching) files instead of all of them.
    *
    * Writer contract: ONE appender at a time per base (the p101 caller
    * serializes through cachedLayout's lock; the s28 stream commits from
    * a single driver). A racing second appender fails LOUDLY — both
    * compute the same version and the second data-file `Files.move`
    * throws on the existing target (the primary guard; the manifest
    * move alone is a POSIX rename, which would replace silently — hence
    * the explicit target-absence check before it). It can never
    * silently corrupt a published manifest.
    */
  def appendSnapshot(base: java.nio.file.Path, df: DataFrame,
                     filesPerVersion: Int = 2,
                     batchId: Option[Long] = None,
                     statsCols: Seq[String] = Nil,
                     layoutCol: Option[String] = None): Int =
    commitVersion(base, df, filesPerVersion, batchId, statsCols, layoutCol,
      carryForward = true)

  /** Publish `df` as a REPLACEMENT version: the new manifest references
    * ONLY the freshly-written files (no carry) — the commit shape of a
    * merge/OPTIMIZE result, where the new version IS the whole corpus
    * rather than an increment. Older versions stay pinned and readable
    * until [[expireVersions]] retires them.
    */
  def replaceSnapshot(base: java.nio.file.Path, df: DataFrame,
                      filesPerVersion: Int = 2,
                      batchId: Option[Long] = None,
                      statsCols: Seq[String] = Nil,
                      layoutCol: Option[String] = None): Int =
    commitVersion(base, df, filesPerVersion, batchId, statsCols, layoutCol,
      carryForward = false)

  /** Rewrite the CURRENT content as one fresh version whose manifest
    * references ONLY the newly-written files — the OPTIMIZE/compaction
    * commit. Older versions stay pinned and readable until
    * [[expireVersions]] retires them; after expiry their files become
    * unreferenced and the orphan sweep reclaims the space. Content is
    * bit-stable: a pinned read of the compacted version returns exactly
    * the pre-compaction rows.
    */
  def compactSnapshot(spark: org.apache.spark.sql.SparkSession,
                      base: java.nio.file.Path,
                      filesPerVersion: Int = 2,
                      statsCols: Seq[String] = Nil,
                      layoutCol: Option[String] = None): Int = {
    val latest = snapshotVersions(base).lastOption.getOrElse(
      throw new IllegalStateException(s"no snapshot versions at $base"))
    replaceSnapshot(base, readSnapshot(spark, base, latest), filesPerVersion,
      statsCols = statsCols, layoutCol = layoutCol)
  }

  /** In-JVM companion to the OS commit lock below: `FileChannel.lock`
    * only BLOCKS across processes — a second thread in the SAME JVM gets
    * an `OverlappingFileLockException` instead of waiting. Same pattern
    * as `Pipeline.cachedLayout`.
    */
  private val commitMutexes =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Serialize commits per snapshot base — in-JVM monitor first, then an
    * OS file lock (`.commit.lock` sibling of `manifests/`). ADVICE r12:
    * the crash-debris sweep in [[commitVersion]] is only safe when no
    * OTHER live writer can be mid-adoption on the same version; without
    * a lock, racing appenders could sweep each other's adopted-but-
    * unpublished files and publish a manifest referencing deleted data —
    * silent corruption. Under the lock, debris observed at entry really
    * is debris from a crashed writer, the version number is stable for
    * the whole adopt→publish window, and a second appender simply queues.
    * The manifest target-absence assertion stays as the loud backstop.
    */
  private def withCommitLock[A](base: java.nio.file.Path)(body: => A): A = {
    val key = base.toAbsolutePath.normalize.toString
    val mutex = commitMutexes.computeIfAbsent(key, _ => new Object)
    mutex.synchronized {
      val lockPath = base.resolve(".commit.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock() // blocks until a competing process commits
        try body finally lk.release()
      } finally ch.close()
    }
  }

  private def commitVersion(base: java.nio.file.Path, df: DataFrame,
                            filesPerVersion: Int, batchId: Option[Long],
                            statsCols: Seq[String], layoutCol: Option[String],
                            carryForward: Boolean): Int = {
    statsCols.foreach(c => require(c.matches("[A-Za-z0-9_.]+"),
      s"stats column name '$c' must be a plain identifier"))
    val dataDir = base.resolve("data")
    val manDir = base.resolve("manifests")
    java.nio.file.Files.createDirectories(dataDir)
    java.nio.file.Files.createDirectories(manDir)
    withCommitLock(base) {
    val prev = snapshotVersions(base)
    // replay of an already-committed batch: the latest manifest carries
    // this batchId — the caller crashed after publish but before its own
    // offset commit. Idempotent skip, same version back.
    val replayOf: Option[Int] = batchId.flatMap(id =>
      prev.lastOption.filter(pv => readManifest(base, pv)._1.contains(id)))
    if (replayOf.isDefined) replayOf.get
    else {
    val version = prev.lastOption.getOrElse(0) + 1
    // crash debris: data files for THIS version with no vN manifest can
    // only be leftovers of an append that died between data-file adoption
    // and manifest publish (single-writer contract) — sweep them, or the
    // retry's own adoption moves would throw FileAlreadyExistsException
    // forever and wedge a restarted streaming ingest (ADVICE r11).
    listDir(dataDir)
      .filter(_.getFileName.toString.matches(s"v$version-\\d+\\.parquet"))
      .foreach(java.nio.file.Files.delete(_))
    val carried: Seq[String] =
      if (!carryForward) Seq.empty
      else prev.lastOption match {
        case Some(pv) => readManifest(base, pv)._2.map(_.line)
        case None     => Seq.empty
      }
    // stage the parquet write, then adopt the parts under stable
    // version-prefixed names (file-content assignment across parts is
    // write-order detail; a pinned read always takes the whole set)
    val staging = java.nio.file.Files.createTempDirectory(base, s"stage-v$version")
    val shaped = layoutCol match {
      case Some(c) => df.repartitionByRange(filesPerVersion, col(c))
      case None    => df.repartition(filesPerVersion)
    }
    shaped.write.mode("overwrite").parquet(staging.resolve("out").toString)
    val parts = listDir(staging.resolve("out"))
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet")).sorted
    val named = parts.zipWithIndex.map { case (p, i) =>
      val name = f"v$version-$i%05d.parquet"
      java.nio.file.Files.move(staging.resolve("out").resolve(p),
        dataDir.resolve(name))
      ManifestEntry(name, footerStats(dataDir.resolve(name), statsCols.toSet)).line
    }
    // clean staging debris (_SUCCESS etc.)
    walkAll(staging).sortBy(-_.getNameCount)
      .foreach(java.nio.file.Files.deleteIfExists(_))
    // manifest commit is the atomic publish point: write-then-move. The
    // move is rename() (replaces silently), so assert target absence
    // first — a lost race is loud here, not silent.
    val meta = batchId.map(id => s"#batch=$id").toSeq
    val tmp = manDir.resolve(s".v$version.txt.tmp")
    java.nio.file.Files.write(tmp,
      (meta ++ carried ++ named).mkString("\n").getBytes("UTF-8"))
    val target = manDir.resolve(s"v$version.txt")
    if (java.nio.file.Files.exists(target))
      throw new IllegalStateException(
        s"concurrent appender already published $target")
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    version
    }
    }
  }

  /** The file list pinned by manifest `version`. */
  def snapshotFiles(base: java.nio.file.Path, version: Int): Seq[String] =
    readManifest(base, version)._2
      .map(e => base.resolve("data").resolve(e.name).toString)

  /** Read EXACTLY snapshot `version` — the pinned file list, never the
    * live directory. Reading v1 while v2 lands returns v1's rows,
    * forever.
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   base: java.nio.file.Path, version: Int): DataFrame =
    spark.read.parquet(snapshotFiles(base, version): _*)

  /** Manifest-stat file pruning for `lo <= col <= hi` (pass null for an
    * open bound): (kept full paths, total files in the version). A file
    * without recorded stats for `col` is KEPT — unknown never prunes.
    * This is what turns a selective pinned read at 100 TB from
    * open-every-file into O(matching-files): the manifest is consulted
    * on the driver, the executors only ever see the surviving paths.
    */
  def pruneSnapshotFiles(base: java.nio.file.Path, version: Int, column: String,
                         lo: Any, hi: Any): (Seq[String], Int) = {
    val entries = readManifest(base, version)._2
    def s(v: Any): String = v match {
      case null => null
      case x    => x.toString
    }
    val (loS, hiS) = (s(lo), s(hi))
    val kept = entries.filter { e =>
      e.stats.get(column) match {
        case None => true
        case Some((kind, mn, mx)) =>
          (loS == null || statCmp(kind, mx, loS) >= 0) &&
            (hiS == null || statCmp(kind, mn, hiS) <= 0)
      }
    }
    (kept.map(e => base.resolve("data").resolve(e.name).toString), entries.size)
  }

  /** Pinned read of `version` restricted to files whose recorded `col`
    * range intersects [lo, hi]: (df, files opened, files in version).
    * The caller still applies its row-level predicate — pruning is a
    * superset guarantee, exactly parquet row-group semantics one level
    * up.
    */
  def readSnapshotRange(spark: org.apache.spark.sql.SparkSession,
                        base: java.nio.file.Path, version: Int, column: String,
                        lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val (kept, total) = pruneSnapshotFiles(base, version, column, lo, hi)
    val df =
      if (kept.nonEmpty) spark.read.parquet(kept: _*)
      else readSnapshot(spark, base, version).limit(0)
    (df, kept.size, total)
  }

  /** Pin version `version` under an immutable NAMED ref (Iceberg-style
    * tag): `manifests/tag-<name>` holds the version number. Tags are
    * release markers — "the training set we shipped" — so they are
    * create-once (a second tag of the same name fails loudly) and
    * [[expireVersions]] NEVER retires a tagged version, however old.
    */
  def tagSnapshot(base: java.nio.file.Path, tag: String, version: Int): Unit = {
    require(tag.matches("[A-Za-z0-9._-]+"), s"bad tag name '$tag'")
    require(snapshotVersions(base).contains(version),
      s"cannot tag missing version $version")
    val f = base.resolve("manifests").resolve(s"tag-$tag")
    java.nio.file.Files.write(f, version.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    ()
  }

  /** All tags at `base`: name → pinned version. */
  def snapshotTags(base: java.nio.file.Path): Map[String, Int] = {
    val manDir = base.resolve("manifests")
    if (!java.nio.file.Files.exists(manDir)) Map.empty
    else listDir(manDir).map(_.getFileName.toString)
      .filter(_.startsWith("tag-"))
      .map { n =>
        n.stripPrefix("tag-") ->
          new String(java.nio.file.Files.readAllBytes(manDir.resolve(n)),
            "UTF-8").trim.toInt
      }.toMap
  }

  /** Pinned read of the version a tag names. */
  def readTag(spark: org.apache.spark.sql.SparkSession,
              base: java.nio.file.Path, tag: String): DataFrame =
    readSnapshot(spark, base,
      snapshotTags(base).getOrElse(tag,
        throw new IllegalArgumentException(s"no tag '$tag' at $base")))

  /** Retire all but the newest `keepN` manifests — TAGGED versions are
    * always retained — then sweep ORPHANS: data files referenced by no
    * retained manifest — space from expired versions (post-compaction)
    * and debris from crashed appends (files adopted into `data/` whose
    * manifest move never happened). Returns (expired versions, deleted
    * data-file names). Retained pinned reads are untouched — GC deletes
    * only what no retained manifest can ever reference (manifests are
    * immutable once published), so "v N is byte-identical before and
    * after GC" holds by construction and is witnessed in SnapshotSpec.
    */
  def expireVersions(base: java.nio.file.Path,
                     keepN: Int): (Seq[Int], Seq[String]) = {
    require(keepN >= 1, "must retain at least one version")
    val versions = snapshotVersions(base)
    val tagged = snapshotTags(base).values.toSet
    val newest = versions.takeRight(keepN).toSet
    val expire = versions.filterNot(v => newest.contains(v) || tagged.contains(v))
    val retain = versions.filterNot(expire.contains)
    val manDir = base.resolve("manifests")
    expire.foreach(v =>
      java.nio.file.Files.deleteIfExists(manDir.resolve(s"v$v.txt")))
    val referenced: Set[String] =
      retain.flatMap(v => readManifest(base, v)._2.map(_.name)).toSet
    val dataDir = base.resolve("data")
    val orphans =
      if (!java.nio.file.Files.exists(dataDir)) Seq.empty[String]
      else listDir(dataDir).map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !referenced.contains(n))
        .sorted
    orphans.foreach(n => java.nio.file.Files.delete(dataDir.resolve(n)))
    (expire, orphans)
  }

  /** Data files present under `base/data/` but referenced by no
    * committed manifest — the audit half of the GC contract (a healthy
    * base reports zero). */
  def orphanFiles(base: java.nio.file.Path): Seq[String] = {
    val referenced = snapshotVersions(base)
      .flatMap(v => readManifest(base, v)._2.map(_.name)).toSet
    val dataDir = base.resolve("data")
    if (!java.nio.file.Files.exists(dataDir)) Seq.empty
    else listDir(dataDir).map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !referenced.contains(n))
      .sorted
  }
}
