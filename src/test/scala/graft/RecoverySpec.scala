package graft

import graft.ops.Layout
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fault-tolerance witnesses: stateful streaming operators must recover
  * their state-store contents when a query RESTARTS from its checkpoint
  * (a different contract than cross-batch state within one run, which
  * StreamingSpec pins), and streaming snapshot ingestion must keep
  * earlier versions pinned while later batches commit.
  */
class RecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("kmvSketchState recovers its k-min state across a query restart") {
    val input = MemoryStream[(String, String)](spark)
    val chk = java.nio.file.Files.createTempDirectory("graft-rec-chk").toString
    // collect per-batch emissions through foreachBatch (the memory sink
    // refuses checkpoint recovery in append mode — by design)
    val emitted = new scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    def run(data: (String, String)): Unit = {
      val q = EventStreams.kmvSketchState(4)(input.toDF().toDF("source", "text"))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", chk)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.collect().map(r => (id, r.getString(0), r.getLong(1)))
          emitted.synchronized { emitted ++= rows: Unit }
        }
        .start()
      input.addData(data)
      q.processAllAvailable()
      q.stop()
    }
    // batch 1 in query 1; batch 2 in a RESTARTED query 2 from the same
    // checkpoint — its emission can only contain batch-1 minima if the
    // state store recovered
    run(("s", "alpha beta gamma delta epsilon"))
    run(("s", "zeta eta theta iota kappa"))

    val lastBatch = emitted.map(_._1).max
    val got = emitted.filter(_._1 == lastBatch).map(_._3).sorted.toSeq
    val want = spark.createDataset(Seq(
        "alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")).toDF("token")
      .select(graft.ops.Sketch.hash60(col("token")).as("h"))
      .orderBy(col("h")).limit(4).collect().map(_.getLong(0)).toSeq
    assert(got === want,
      "restarted query's sketch must be the k-min over BOTH batches")
  }

  test("streaming snapshot ingest: earlier versions stay pinned as batches land") {
    val input = MemoryStream[(Long, String)](spark)
    val base = java.nio.file.Files.createTempDirectory("graft-rec-snap")
    val q = input.toDF().toDF("id", "t").writeStream
      .option("checkpointLocation", base.resolve("_chk").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) Layout.appendSnapshot(base, df): Unit
      }
      .start()
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    val v1Rows = Layout.readSnapshot(spark, base, 1)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(v1Rows === Seq(1L, 2L))
    input.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    // v1 is byte-identical after the second commit; v2 is the union
    assert(Layout.readSnapshot(spark, base, 1)
      .collect().map(_.getLong(0)).sorted.toSeq === v1Rows)
    assert(Layout.readSnapshot(spark, base, 2)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("snapshot commit is replay-idempotent on the stamped batchId") {
    // the at-least-once hole: foreachBatch commits the manifest, then the
    // process dies BEFORE the checkpoint offset commit — on restart the
    // SAME batch (same batchId, same rows) runs again. The manifest's
    // #batch stamp must make the second commit a no-op.
    val base = java.nio.file.Files.createTempDirectory("graft-rec-replay")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    val b1 = Seq((3L, "c")).toDF("id", "t")
    assert(Layout.appendSnapshot(base, b0, batchId = Some(0L)) === 1)
    assert(Layout.appendSnapshot(base, b1, batchId = Some(1L)) === 2)
    val before = Layout.readSnapshot(spark, base, 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    // replay of batch 1 (crash between manifest move and offset commit)
    assert(Layout.appendSnapshot(base, b1, batchId = Some(1L)) === 2,
      "replayed batch must return the already-committed version")
    assert(Layout.snapshotVersions(base) === Seq(1, 2),
      "replay must not publish a duplicate version")
    assert(Layout.readSnapshot(spark, base, 2)
      .collect().map(_.getLong(0)).sorted.toSeq === before,
      "latest version content unchanged under replay")
    // a genuinely NEW batch still appends
    assert(Layout.appendSnapshot(base, Seq((4L, "d")).toDF("id", "t"),
      batchId = Some(2L)) === 3)
    assert(Layout.readSnapshot(spark, base, 3)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }
}
