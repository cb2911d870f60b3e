package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-pinned snapshot contracts beyond basic pinning (OpsSpec /
  * RecoverySpec): footer-stat recording + file pruning, compaction
  * content-stability, retention + orphan GC, and loud data-file
  * collision on a racing appender.
  */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmpBase() = java.nio.file.Files.createTempDirectory("graft-snap")

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"doc-$i", s"s${i % 3}")).toDF("id", "t", "src")

  test("manifest records footer min/max; range layout makes pruning selective") {
    val base = tmpBase()
    Layout.appendSnapshot(base, rows(0, 100), filesPerVersion = 4,
      statsCols = Seq("id", "src"), layoutCol = Some("id"))
    val (_, entries) = Layout.readManifest(base, 1)
    assert(entries.size === 4)
    assert(entries.forall(_.stats.contains("id")))
    // global min/max across files must cover exactly 0..99
    val mins = entries.map(_.stats("id")._2.toLong)
    val maxs = entries.map(_.stats("id")._3.toLong)
    assert(mins.min === 0L && maxs.max === 99L)
    // range layout => disjoint id ranges => a 10-wide probe opens <= 2 files
    val (df, kept, total) = Layout.readSnapshotRange(spark, base, 1, "id", 40L, 49L)
    assert(total === 4 && kept < total, s"pruning must drop files ($kept/$total)")
    assert(df.where($"id".between(40, 49)).count() === 10,
      "pruned read is a superset of the matching rows")
    // string stats prune too (src in s0/s1/s2 — all files contain all, so
    // an out-of-range probe drops everything)
    val (_, kept2, _) = Layout.readSnapshotRange(spark, base, 1, "src", "zz", "zz")
    assert(kept2 === 0, "no file's [min,max] intersects [zz,zz]")
    // a column with no recorded stats never prunes
    val (k3, t3) = Layout.pruneSnapshotFiles(base, 1, "t", "a", "b")
    assert(k3.size === t3, "unknown column keeps every file")
    // open bounds
    val (k4, _) = Layout.pruneSnapshotFiles(base, 1, "id", 90L, null)
    assert(k4.nonEmpty && k4.size < 4)
  }

  test("stats lines carry forward across appends; stat-less appends still read") {
    val base = tmpBase()
    Layout.appendSnapshot(base, rows(0, 50), filesPerVersion = 2,
      statsCols = Seq("id"), layoutCol = Some("id"))
    Layout.appendSnapshot(base, rows(50, 100), filesPerVersion = 2)
    val (_, e2) = Layout.readManifest(base, 2)
    assert(e2.size === 4)
    val (withStats, bare) = e2.partition(_.stats.nonEmpty)
    assert(withStats.size === 2 && bare.size === 2,
      "v1's stats survive the carry; v2's files are bare")
    // pruning keeps ALL v2 files (no stats) plus matching v1 files
    val (kept, total) = Layout.pruneSnapshotFiles(base, 2, "id", 0L, 10L)
    assert(total === 4 && kept.size === 3)
    assert(Layout.readSnapshot(spark, base, 2).count() === 100)
  }

  test("compaction rewrites content bit-stable into only-fresh files") {
    val base = tmpBase()
    Layout.appendSnapshot(base, rows(0, 40), filesPerVersion = 3)
    Layout.appendSnapshot(base, rows(40, 60), filesPerVersion = 3)
    val before = Layout.readSnapshot(spark, base, 2)
      .orderBy($"id").collect().toSeq
    val v = Layout.compactSnapshot(spark, base, filesPerVersion = 2,
      statsCols = Seq("id"), layoutCol = Some("id"))
    assert(v === 3)
    val (_, e3) = Layout.readManifest(base, 3)
    assert(e3.size === 2 && e3.forall(_.name.startsWith("v3-")),
      "compacted manifest references only freshly-written files")
    assert(Layout.readSnapshot(spark, base, 3)
      .orderBy($"id").collect().toSeq === before,
      "compaction must be content-identical")
    // v2 remains pinned and readable until expiry
    assert(Layout.readSnapshot(spark, base, 2)
      .orderBy($"id").collect().toSeq === before)
  }

  test("expireVersions retires manifests and sweeps orphans; retained reads unchanged") {
    val base = tmpBase()
    Layout.appendSnapshot(base, rows(0, 40), filesPerVersion = 2)
    Layout.appendSnapshot(base, rows(40, 60), filesPerVersion = 2)
    Layout.compactSnapshot(spark, base, filesPerVersion = 2)
    // crashed append: a data file adopted into data/ whose manifest move
    // never happened
    val dataDir = base.resolve("data")
    java.nio.file.Files.write(dataDir.resolve("v9-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(Layout.orphanFiles(base) === Seq("v9-00000.parquet"))
    val keep = Layout.readSnapshot(spark, base, 3).orderBy($"id").collect().toSeq
    val (expired, deleted) = Layout.expireVersions(base, keepN = 1)
    assert(expired === Seq(1, 2))
    // v1+v2 contributed 4 shared data files, all unreferenced by v3's
    // compacted manifest; plus the crashed-append orphan
    assert(deleted.size === 5 && deleted.contains("v9-00000.parquet"))
    assert(Layout.snapshotVersions(base) === Seq(3))
    assert(Layout.orphanFiles(base).isEmpty, "post-GC base audits clean")
    assert(Layout.readSnapshot(spark, base, 3)
      .orderBy($"id").collect().toSeq === keep,
      "retained pinned read byte-identical across GC")
    // without compaction, cumulative manifests keep every file referenced:
    // expiry then deletes NO data files
    val base2 = tmpBase()
    Layout.appendSnapshot(base2, rows(0, 10))
    Layout.appendSnapshot(base2, rows(10, 20))
    val (_, deleted2) = Layout.expireVersions(base2, keepN = 1)
    assert(deleted2.isEmpty, "files carried by the retained manifest survive")
    assert(Layout.readSnapshot(spark, base2, 2).count() === 20)
  }

  test("batchId metadata and stats lines coexist in one manifest") {
    val base = tmpBase()
    Layout.appendSnapshot(base, rows(0, 40), filesPerVersion = 2,
      batchId = Some(7L), statsCols = Seq("id"), layoutCol = Some("id"))
    val (batch, entries) = Layout.readManifest(base, 1)
    assert(batch === Some(7L), "the #batch metadata line survives parsing")
    assert(entries.size === 2 && entries.forall(_.stats.contains("id")),
      "stats lines parse alongside the metadata line")
    // replay with the same id: skip; pruning still works on the manifest
    assert(Layout.appendSnapshot(base, rows(0, 40), batchId = Some(7L)) === 1)
    val (kept, total) = Layout.pruneSnapshotFiles(base, 1, "id", 0L, 5L)
    assert(total === 2 && kept.size === 1)
  }

  test("tags pin versions through GC; tags are create-once") {
    val base = tmpBase()
    Layout.appendSnapshot(base, rows(0, 20))
    Layout.tagSnapshot(base, "release-1", 1)
    Layout.appendSnapshot(base, rows(20, 40))
    Layout.compactSnapshot(spark, base)
    val tagBefore = Layout.readTag(spark, base, "release-1")
      .orderBy($"id").collect().toSeq
    val (expired, deleted) = Layout.expireVersions(base, keepN = 1)
    assert(expired === Seq(2), "tagged v1 survives expiry; untagged v2 goes")
    assert(Layout.snapshotVersions(base) === Seq(1, 3))
    // v2's two own files are unreferenced by v1 or v3; v1's files survive
    assert(deleted.size === 2)
    assert(Layout.readTag(spark, base, "release-1")
      .orderBy($"id").collect().toSeq === tagBefore,
      "tag read byte-identical across GC")
    assert(Layout.snapshotTags(base) === Map("release-1" -> 1))
    intercept[java.nio.file.FileAlreadyExistsException] {
      Layout.tagSnapshot(base, "release-1", 3)
    }
    intercept[IllegalArgumentException] {
      Layout.tagSnapshot(base, "ghost", 99)
    }
  }

  test("string stats compare on UTF-8 bytes: supplementary chars never lose rows") {
    // ADVICE r11: parquet footer binary stats order by unsigned UTF-8
    // bytes, where U+E000 (ee 80 80) < U+1D11E (f0 9d 84 9e); Java
    // String.compareTo (UTF-16 code units) says the OPPOSITE ( >
    // \ud834..). A file holding BOTH values records min=U+E000, max=U+1D11E;
    // probing [U+1D11E, U+1D11E] under UTF-16 comparison computes min > hi and
    // wrongly prunes the file — silent row loss. The UTF-8 comparator
    // must keep it.
    val base = tmpBase()
    val g = new String(Character.toChars(0x1D11E)) // musical G clef
    val both = Seq((1L, "\ue000"), (2L, g)).toDF("id", "s")
    Layout.appendSnapshot(base, both, filesPerVersion = 1, statsCols = Seq("s"))
    val (df, kept, total) = Layout.readSnapshotRange(spark, base, 1, "s", g, g)
    assert(total === 1 && kept === 1,
      "the file whose UTF-8 range contains the probe must be kept")
    assert(df.where($"s" === g).count() === 1, "no silent row loss")
  }

  test("crash debris for the next version is swept; the retry commits") {
    // ADVICE r11: an append that died between data-file adoption and
    // manifest publish leaves data/vN-*.parquet with no vN manifest —
    // under the single-writer contract that is debris, and the retry
    // (e.g. a restarted streaming snapshotIngest) must sweep it and
    // commit rather than throw FileAlreadyExistsException forever.
    val base = tmpBase()
    Layout.appendSnapshot(base, rows(0, 10))
    java.nio.file.Files.write(base.resolve("data").resolve("v2-00000.parquet"),
      Array[Byte](0)) // the crashed append's adopted-but-unpublished file
    val v = Layout.appendSnapshot(base, rows(10, 20))
    assert(v === 2, "retry commits the version the crashed append targeted")
    assert(Layout.snapshotVersions(base) === Seq(1, 2))
    assert(Layout.readSnapshot(spark, base, 2).count() === 20)
    assert(Layout.orphanFiles(base).isEmpty, "no debris survives the retry")
    // race loudness lives at the manifest PUBLISH now (target-absence
    // check before the rename) — a true interleaving can't be staged
    // sequentially, so that guard is pinned by code, not by this spec
  }
}
