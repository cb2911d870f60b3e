package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("feature extraction: fixed shape, deterministic, null-safe") {
    val df = Seq(
      (1L, "hello world".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "media")
    val out = Multimodal.extractFeatures(df, "id", "media", "test")
      .orderBy($"id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_bytes") == 11L)
    assert(out(0).getAs[scala.collection.Seq[Float]]("features").length == Multimodal.FeatureDim)
    assert(out(1).getAs[Long]("n_bytes") == 0L)
    assert(out(2).getAs[Long]("n_bytes") == 0L && out(2).getAs[Long]("checksum") == 0L)
    // determinism
    val again = Multimodal.extractFeatures(df, "id", "media", "test")
      .orderBy($"id").collect()
    assert(out.zip(again).forall { case (a, b) => a == b })
  }

  test("frame sampling: every k-th fixed-size chunk, no shuffle shape") {
    val media = Array.tabulate(100)(_.toByte)
    val df = Seq((7L, media)).toDF("id", "media")
    val frames = Multimodal.sampleFrames(df, "id", "media", frameBytes = 10, everyK = 3)
      .orderBy($"frame_idx").collect()
    // chunks 0..9 (10 full), sampled 0,3,6,9
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 10))
    assert(frames(1).getAs[Array[Byte]]("frame").head == 30.toByte)
  }
}
