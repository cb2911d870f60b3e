package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Layout]] snapshot series: manifest-pinned reads must be
  * immutable under later appends.
  */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("a pinned version returns the same rows forever") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap")
    val v1df = (0 until 30).map(i => (i.toLong, s"text $i")).toDF("id", "t")
    val v1 = Layout.appendSnapshot(base, v1df)
    assert(v1 === 1)
    val before = Layout.readSnapshot(spark, base, 1)
      .orderBy($"id").collect().map(_.getLong(0)).toSeq
    assert(before === (0L until 30L))

    val v2df = (30 until 50).map(i => (i.toLong, s"text $i")).toDF("id", "t")
    assert(Layout.appendSnapshot(base, v2df) === 2)

    // v1 after the append: unchanged; v2: union
    val after = Layout.readSnapshot(spark, base, 1)
      .orderBy($"id").collect().map(_.getLong(0)).toSeq
    assert(after === before, "append must not change a pinned read")
    val all = Layout.readSnapshot(spark, base, 2)
      .orderBy($"id").collect().map(_.getLong(0)).toSeq
    assert(all === (0L until 50L))
  }

  test("manifests pin by file list, not directory listing") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap2")
    Layout.appendSnapshot(base, Seq((1L, "a")).toDF("id", "t"))
    // a foreign file landing in data/ (debris, concurrent writer) is
    // invisible to every pinned read
    Seq((99L, "intruder")).toDF("id", "t").write
      .parquet(base.resolve("data").resolve("zz-intruder.parquet").toString)
    val got = Layout.readSnapshot(spark, base, 1).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
    assert(Layout.snapshotFiles(base, 1).size === 2)
  }

  test("version numbering continues from the latest manifest") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap3")
    Layout.appendSnapshot(base, Seq((1L, "a")).toDF("id", "t"))
    Layout.appendSnapshot(base, Seq((2L, "b")).toDF("id", "t"))
    val v3 = Layout.appendSnapshot(base, Seq((3L, "c")).toDF("id", "t"))
    assert(v3 === 3)
    assert(Layout.readSnapshot(spark, base, 3).count() === 3)
    assert(Layout.readSnapshot(spark, base, 2).count() === 2)
  }
}
