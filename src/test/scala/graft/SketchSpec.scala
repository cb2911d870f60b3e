package graft

import graft.ops.Sketch
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("kmv is exact below k, approximate within tolerance above it") {
    val small = (1 to 40).map(i => ("s", s"tok$i"))
    val big = (1 to 20000).map(i => ("b", s"word$i"))
    val df = (small ++ big).toDF("g", "v").repartition(8)
    val out = Sketch.kmvDistinct(df, "g", "v", k = 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("s") == ((40L, 40.0)))          // < k -> sketch holds the whole set
    val (kept, est) = out("b")
    assert(kept == 256L)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - 20000) / 20000.0 < 0.25, s"estimate $est")
  }

  test("salt pre-cut does not change the result") {
    val df = (1 to 5000).map(i => ("g", s"v${i % 1371}")).toDF("g", "v")
    val a = Sketch.kmvDistinct(df, "g", "v", k = 64, saltBuckets = 1).collect()
    val b = Sketch.kmvDistinct(df, "g", "v", k = 64, saltBuckets = 32).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("duplicates never inflate the estimate") {
    val once = (1 to 3000).map(i => ("g", s"u$i"))
    val dup = once ++ once ++ once
    val a = Sketch.kmvDistinct(once.toDF("g", "v"), "g", "v", k = 128).collect()(0)
    val b = Sketch.kmvDistinct(dup.toDF("g", "v"), "g", "v", k = 128).collect()(0)
    assert(a.getDouble(2) == b.getDouble(2))
  }
}
