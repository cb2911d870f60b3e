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

  test("setops: unsaturated pairs are exact set algebra") {
    // |A|=30, |B|=30, |A∩B|=10 → union 50 < k: everything exact
    val a = (1 to 30).map(i => ("a", s"t$i"))
    val b = (21 to 50).map(i => ("b", s"t$i"))
    val out = Sketch.kmvSetOps((a ++ b).toDF("g", "v"), "g", "v", k = 64)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getAs[Long]("n_kept") == 50L)
    assert(r.getAs[Double]("est_union") == 50.0)
    assert(r.getAs[Double]("est_jaccard") == 0.2)
    assert(r.getAs[Double]("est_intersection") == 10.0)
  }

  test("setops: saturated estimates land near the true values; disjoint sets at zero") {
    val a = (1 to 8000).map(i => ("a", s"t$i"))
    val b = (4001 to 12000).map(i => ("b", s"t$i"))   // true: U=12000, I=4000, J=1/3
    val c = (1 to 8000).map(i => ("c", s"other$i"))   // disjoint from both
    val rows = Sketch.kmvSetOps((a ++ b ++ c).toDF("g", "v"), "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = rows(("a", "b"))
    assert(math.abs(ab.getAs[Double]("est_union") - 12000) / 12000.0 < 0.25)
    assert(math.abs(ab.getAs[Double]("est_jaccard") - 1.0 / 3) < 0.15)
    assert(math.abs(ab.getAs[Double]("est_intersection") - 4000) / 4000.0 < 0.4)
    assert(rows(("a", "c")).getAs[Double]("est_jaccard") == 0.0)
    assert(rows(("a", "c")).getAs[Double]("est_intersection") == 0.0)
    assert(rows(("b", "c")).getAs[Double]("est_jaccard") == 0.0)
  }
}
