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
}
