package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (key, time, quote) fact table; unique per (key, time) as asofJoin requires
  private lazy val quotes = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 10.0),
    ("c", 99L, 7.0)
  ).toDF("k", "qt", "quote")

  // (key, time) probes, including exact-tie, before-first and missing-key rows
  private lazy val trades = Seq(
    ("t1", "a", 5L),   // before any quote
    ("t2", "a", 20L),  // exact tie with the 2.0 quote
    ("t3", "a", 25L),  // between quotes -> 2.0
    ("t4", "a", 99L),  // after the last -> 3.0
    ("t5", "b", 15L),  // tie on b
    ("t6", "z", 50L)   // key with no quotes at all
  ).toDF("id", "k", "tt")

  private def asofMap(strict: Boolean): Map[String, Option[Double]] = {
    // brute-force reference: greatest quote time <= (or <) trade time per key
    val q = quotes.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    trades.collect().map { r =>
      val (id, k, t) = (r.getString(0), r.getString(1), r.getLong(2))
      val elig = q.filter(x => x._1 == k && (if (strict) x._2 < t else x._2 <= t))
      id -> (if (elig.isEmpty) None else Some(elig.maxBy(_._2)._3))
    }.toMap
  }

  test("asof inclusive: most recent quote at-or-before each trade; inner drops unmatched") {
    val out = Joins.asofJoin(trades, quotes, "k", "k", "tt", "qt", Seq("quote"))
      .select($"id", $"quote").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = asofMap(strict = false).collect { case (id, Some(v)) => id -> v }
    assert(out == expect)
    assert(!out.contains("t1") && !out.contains("t6"))
  }

  test("asof strict: an equal-time quote is not visible") {
    val out = Joins.asofJoin(trades, quotes, "k", "k", "tt", "qt", Seq("quote"), strict = true)
      .select($"id", $"quote").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = asofMap(strict = true).collect { case (id, Some(v)) => id -> v }
    assert(out == expect)
    // the t2 tie resolves to the PREVIOUS quote under strict semantics
    assert(out("t2") == 1.0)
  }

  test("asof left: unmatched trades kept with null quote, all left columns intact") {
    val out = Joins.asofJoin(trades, quotes, "k", "k", "tt", "qt", Seq("quote"), inner = false)
    assert(out.count() == trades.count())
    val nulls = out.filter($"quote".isNull).select($"id").collect().map(_.getString(0)).toSet
    assert(nulls == Set("t1", "t6"))
    assert(out.columns.toSeq == Seq("id", "k", "tt", "quote"))
  }

  test("range join equals brute-force cross+filter, including negatives and bin edges") {
    val points = (-25 to 25).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val ivs = Seq(
      (1L, -3.0, 3.0), (2L, 0.0, 0.0), (3L, -20.0, -10.0),
      (4L, 9.95, 10.05), (5L, 30.0, 40.0) // empty interval
    ).toDF("iid", "lo", "hi")
    for (w <- Seq(0.5, 3.0, 100.0)) {
      val binned = Joins.rangeJoin(points, ivs, "v", "lo", "hi", binWidth = w)
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = points.crossJoin(ivs)
        .filter($"v" >= $"lo" && $"v" <= $"hi")
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == brute, s"binWidth=$w")
      // no duplicate pairs from multi-bin intervals
      assert(Joins.rangeJoin(points, ivs, "v", "lo", "hi", binWidth = w).count() == brute.size)
    }
  }

  test("range join plan is an equi-join on bins, not a nested-loop join") {
    val points = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("pid", "v")
    val ivs = (1 to 50).map(i => (i.toLong, i - 0.5, i + 0.5)).toDF("iid", "lo", "hi")
    val plan = Joins.rangeJoin(points, ivs, "v", "lo", "hi", binWidth = 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
