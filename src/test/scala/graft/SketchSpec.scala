package graft

import graft.ops.Sketch
import org.apache.spark.sql.functions._
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

  // ---- HyperLogLog -------------------------------------------------------

  test("hll: estimate lands within theoretical error at several scales") {
    // sigma ≈ 1.04/sqrt(m); at p=9 (m=512) that is 4.6% — allow 4 sigma.
    // One fixed hash function, so this is a determinism check, not a
    // statistical one: the tolerance just needs to absorb this dataset's
    // realized error once.
    val df = Seq(200, 5000, 100000)
      .flatMap(n => (1 to n).map(i => (s"n$n", s"val-$i")))
      .toDF("g", "v").repartition(8)
    val out = Sketch.hllDistinct(df, "g", "v", p = 9)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    for (n <- Seq(200, 5000, 100000))
      assert(math.abs(out(s"n$n") - n) / n.toDouble < 4 * 1.04 / math.sqrt(512),
        s"n=$n est=${out(s"n$n")}")
  }

  test("hll: linear-counting branch fires below 2.5m and is near-exact") {
    // n=100 << m=512: most registers empty, raw estimate <= 2.5m, so the
    // estimator must take m·ln(m/V) — verify by recomputing it from the
    // emitted v_zero and matching est_distinct exactly.
    val df = (1 to 100).map(i => ("g", s"x$i")).toDF("g", "v")
    val r = Sketch.hllDistinct(df, "g", "v", p = 9).collect()(0)
    val vZero = r.getAs[Int]("v_zero")
    assert(vZero > 0)
    val lc = BigDecimal(512.0 * math.log(512.0 / vZero))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("est_distinct") == lc)
    assert(math.abs(r.getAs[Double]("est_distinct") - 100) < 10)
  }

  test("hll: duplicates never move the sketch") {
    val once = (1 to 3000).map(i => ("g", s"u$i"))
    val a = Sketch.hllDistinct(once.toDF("g", "v"), "g", "v").collect()(0)
    val b = Sketch.hllDistinct((once ++ once ++ once).toDF("g", "v"), "g", "v")
      .collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("hll: merge by register-max equals the direct sketch, associatively") {
    // three overlapping shards; merged-in-any-order == sketch of the union
    val s1 = (1 to 4000).map(i => ("s1", s"k$i"))
    val s2 = (2001 to 7000).map(i => ("s2", s"k$i"))
    val s3 = (6001 to 9000).map(i => ("s3", s"k$i"))
    val regs = Sketch.hllRegisters(
      (s1 ++ s2 ++ s3).toDF("g", "v"), Seq("g"), "v", p = 9)
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllEstimate(df.withColumn("g", lit("m")), Seq("g"), p = 9)
        .collect()(0).toSeq
    val direct = Sketch.hllDistinct(
      (s1 ++ s2 ++ s3).map { case (_, v) => ("m", v) }.toDF("g", "v"), "g", "v")
      .collect()(0).toSeq
    // (s1 ∪ s2) ∪ s3 and s1 ∪ (s2 ∪ s3) as raw unordered unions: the
    // defensive max-re-aggregation inside hllEstimate does the merging
    val m12 = regs.filter($"g" isin ("s1", "s2"))
    val m23 = regs.filter($"g" isin ("s2", "s3"))
    assert(est(m12.union(regs.filter($"g" === "s3"))) == direct)
    assert(est(regs.filter($"g" === "s1").union(m23)) == direct)
  }

  // ---- histogram quantile sketch ----------------------------------------

  test("histogram quantiles: estimate within one bin width; rank arithmetic exact") {
    // uniform 1..10000 over [0, 10240) with 64 bins (width 160): the
    // interpolated estimate must land within one bin of the true quantile
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val hist = Sketch.histogramSketch(df, Seq("g"), "v", 0.0, 10240.0, 64)
    assert(hist.count() <= 64)
    val est = Sketch.histogramQuantiles(hist, Seq("g"), 0.0, 10240.0, 64,
        Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    for ((q, truth) <- Seq("p50" -> 5000.0, "p90" -> 9000.0, "p99" -> 9900.0))
      assert(math.abs(est(q) - truth) <= 160.0, s"$q est ${est(q)}")
  }

  test("histogram: out-of-range values clamp to edge bins; merge by sum = direct") {
    val a = (1 to 500).map(i => ("a", i.toDouble))
    val b = (1 to 500).map(i => ("b", (i + 250).toDouble))
    val out = Seq(("a", -50.0), ("a", 99999.0)) // below lo / above hi
    val df = (a ++ b ++ out).toDF("g", "v")
    val hist = Sketch.histogramSketch(df, Seq("g"), "v", 0.0, 1024.0, 32)
    val bins = hist.filter($"g" === "a").collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(bins.keys.min == 0 && bins.keys.max == 31) // clamped, not dropped
    assert(hist.agg(sum($"cnt")).collect()(0).getLong(0) == 1002L)
    // merged (union + re-agg inside histogramQuantiles) == direct on a∪b
    val merged = Sketch.histogramQuantiles(
      hist.withColumn("g", lit("m")), Seq("g"), 0.0, 1024.0, 32, Seq((1, 2, "p50")))
      .collect()(0).toSeq
    val direct = Sketch.histogramQuantiles(
      Sketch.histogramSketch(df.withColumn("g", lit("m")), Seq("g"), "v", 0.0, 1024.0, 32),
      Seq("g"), 0.0, 1024.0, 32, Seq((1, 2, "p50"))).collect()(0).toSeq
    assert(merged == direct)
  }

  // ---- count-min sketch --------------------------------------------------

  test("cms: estimates upper-bound true frequencies; sparse load is exact") {
    // 20 distinct values into 4x512 cells: collision probability per row is
    // tiny, and min-over-4-rows needs only ONE collision-free row — exact
    val vals = (1 to 20).flatMap(i => Seq.fill(i)(("g", s"tok$i")))
    val cms = Sketch.cmsSketch(vals.toDF("g", "v"), Seq("g"), "v", depth = 4, width = 512)
    val queries = (1 to 20).map(i => s"tok$i").toDF("q")
    val est = Sketch.cmsEstimate(cms, Seq("g"), queries, depth = 4, width = 512)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    for (i <- 1 to 20) assert(est(s"tok$i") == i.toLong, s"tok$i")
    // absent value: est >= 0 and bounded by the heaviest cell
    val absent = Sketch.cmsEstimate(cms, Seq("g"),
      Seq("nope").toDF("q"), depth = 4, width = 512).collect()(0).getLong(2)
    assert(absent >= 0L && absent <= 20L)
  }

  test("cms: merge by cell-sum equals the direct sketch; never underestimates under load") {
    val s1 = (1 to 3000).map(i => ("s1", s"w${i % 97}"))
    val s2 = (1 to 3000).map(i => ("s2", s"w${i % 113}"))
    val cms = Sketch.cmsSketch((s1 ++ s2).toDF("g", "v"), Seq("g"), "v", 4, 128)
    val queries = (0 until 97).map(i => s"w$i").toDF("q")
    val merged = Sketch.cmsEstimate(cms.withColumn("g", lit("m")),
      Seq("g"), queries, 4, 128).collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val direct = Sketch.cmsEstimate(
      Sketch.cmsSketch((s1 ++ s2).map { case (_, v) => ("m", v) }.toDF("g", "v"),
        Seq("g"), "v", 4, 128),
      Seq("g"), queries, 4, 128).collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(merged == direct)
    // true combined frequency of w_i: s1 contributes ~31 for i<97, s2 ~27
    // for i<113; the CMS may only overestimate
    val exact = (s1 ++ s2).groupBy(_._2).view.mapValues(_.size).toMap
    for (i <- 0 until 97) assert(merged(s"w$i") >= exact(s"w$i").toLong, s"w$i")
  }

  test("hll: rho covers the all-rank-bits-zero boundary") {
    // hllRegisters on a value whose hash has (h >> p) == 0 must emit the
    // max rank q1 = 61 - p, not a length(bin(0)) artifact. Hash space is
    // 2^60, so brute-force such a value at p=16 (q1=45, P(hit) = 2^-44 per
    // value — can't brute-force); instead verify the rank formula across
    // the full rho range synthetically via p=4..16 register bounds.
    for (p <- Seq(4, 9, 16)) {
      val regs = Sketch.hllRegisters(
        (1 to 2000).map(i => ("g", s"b$i")).toDF("g", "v"), Seq("g"), "v", p)
      val stats = regs.agg(min($"idx"), max($"idx"), min($"mj"), max($"mj"))
        .collect()(0)
      assert(stats.getLong(0) >= 0L && stats.getLong(1) < (1L << p))
      assert(stats.getInt(2) >= 1 && stats.getInt(3) <= 61 - p)
      assert(regs.groupBy($"g", $"idx").count().filter($"count" > 1).isEmpty)
    }
  }

  test("hdr: relative error bounded by the sub-bucket width at any magnitude") {
    // log-uniform values across five orders of magnitude — the domain an
    // equi-width histogram can't grid in advance
    val r = new scala.util.Random(5)
    val vals = (1 to 20000).map(_ => ("g", math.round(math.pow(10, 1 + 4 * r.nextDouble()))))
    val df = vals.toDF("g", "value")
    val est = Sketch.hdrQuantiles(
      Sketch.hdrSketch(df, Seq("g"), "value"), Seq("g"), subBits = 4,
      qs = Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")))
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    val sorted = vals.map(_._2).sorted
    def rankVal(num: Int, den: Int) = sorted((sorted.size * num + den - 1) / den - 1)
    for ((q, (num, den)) <- Seq("p50" -> (1, 2), "p90" -> (9, 10), "p99" -> (99, 100))) {
      val truth = rankVal(num, den).toDouble
      // bin width / lower bound ≤ 2^-(subBits-1) = 1/8; interpolation adds
      // at most one more width
      assert(math.abs(est(q) - truth) / truth <= 0.25,
        s"$q: est ${est(q)} vs true $truth")
    }
  }

  test("hdr: small values get exact unit bins; clamp at 1; merge by sum = direct") {
    val a = (1 to 50).flatMap(i => Seq.fill(i)(("a", i.toLong)))
    val b = Seq(("b", 0L), ("b", -7L), ("b", 1L)) // clamp to 1
    val df = (a ++ b).toDF("g", "value")
    val sk = Sketch.hdrSketch(df, Seq("g"), "value")
    // values < 2^subBits land in width-1 bins -> the sketch IS the exact
    // distribution there
    val unit = sk.filter($"g" === "a" && $"b" <= 4)
      .select($"sub", $"cnt").as[(Long, Long)].collect().toMap
    (1 to 15).foreach(i => assert(unit(i.toLong) == i.toLong))
    assert(sk.filter($"g" === "b").select($"sub", $"cnt").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 3L)))
    // merge: union of two half-sketches re-aggregates to the direct one
    val half1 = Sketch.hdrSketch(a.take(600).toDF("g", "value"), Seq("g"), "value")
    val half2 = Sketch.hdrSketch(a.drop(600).toDF("g", "value"), Seq("g"), "value")
    val merged = Sketch.hdrQuantiles(half1.union(half2), Seq("g"), 4,
      Seq((1, 2, "p50"), (99, 100, "p99"))).collect().map(_.toSeq).toSet
    val direct = Sketch.hdrQuantiles(
      Sketch.hdrSketch(a.toDF("g", "value"), Seq("g"), "value"), Seq("g"), 4,
      Seq((1, 2, "p50"), (99, 100, "p99"))).collect().map(_.toSeq).toSet
    assert(merged == direct)
  }

  test("hdr: bin assignment is pure integer arithmetic (boundary values)") {
    // powers of two sit at bin boundaries — the values a float-log bucket
    // rule can misplace; the bit-length rule can't
    val vals = Seq(1L, 2L, 15L, 16L, 17L, 255L, 256L, (1L << 40) - 1, 1L << 40)
    val sk = Sketch.hdrSketch(vals.map(("g", _)).toDF("g", "value"), Seq("g"), "value")
      .select($"b", $"sub", $"cnt").as[(Int, Long, Long)].collect().toSet
    def expected(v: Long) = {
      val b = 64 - java.lang.Long.numberOfLeadingZeros(v)
      (b, v >> math.max(b - 4, 0))
    }
    val want = vals.groupBy(expected).map { case ((b, s), vs) => (b, s, vs.size.toLong) }.toSet
    assert(sk == want)
  }
}
