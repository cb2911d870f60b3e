package graft

import graft.ops.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Ranking]]: exact global row numbers / prefix sums computed
  * distributed (bucket offsets + per-bucket windows) must equal the naive
  * single-partition global window.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def fixture = {
    val r = new scala.util.Random(97)
    // heavy bucket duplication (score domain 0..19) and unordered input
    (0 until 500).map(i => (i.toLong, r.nextInt(20).toLong, r.nextInt(100) + 1L))
      .sortBy(_._3) // shuffle row order away from the id order
      .toDF("id", "score", "tok")
      .repartition(7)
  }

  test("withGlobalOrder == naive global window (rank and prefix sum)") {
    val df = fixture
    val got = Ranking
      .withGlobalOrder(df, "score", Seq("id"), "rnk", Some("tok"), "cum")
      .select($"id", $"rnk", $"cum")
    val w = Window.orderBy($"score", $"id")
    val want = df
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cum",
        sum($"tok").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select($"id", $"rnk", $"cum")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "distributed order stats must equal the naive global window")
  }

  test("the corpus-scale side never collapses to one partition") {
    val df = fixture
    val ranked = Ranking.withGlobalOrder(df, "score", Seq("id"), "rnk")
    // the only single-partition window allowed is over the BUCKET table
    // (20 rows here); the corpus-side window must stay partitioned by
    // bucket — visible as a hash-partitioned Exchange feeding the big
    // window and a broadcast join for the offsets
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"bucket offsets must broadcast:\n$plan")
    assert(plan.contains("hashpartitioning(score"),
      s"corpus window must partition by the bucket column:\n$plan")
  }

  test("shardByRank: ntile-equal boundaries on divisible n, deterministic otherwise") {
    val n = lit(500L)
    val shards = spark.range(1, 501)
      .select(Ranking.shardByRank($"id", 5, n).as("shard"))
      .groupBy($"shard").count().orderBy($"shard")
      .as[(Int, Long)].collect()
    assert(shards.toSeq == Seq((0, 100L), (1, 100L), (2, 100L), (3, 100L), (4, 100L)))
    // n = 7, k = 3: sizes within one of each other, ranks contiguous
    val s7 = spark.range(1, 8)
      .select($"id", Ranking.shardByRank($"id", 3, lit(7L)).as("shard"))
      .as[(Long, Int)].collect().toSeq
    assert(s7.map(_._2) == Seq(0, 0, 0, 1, 1, 2, 2))
  }

  test("shardByBudget: a document belongs to the shard its first token lands in") {
    val df = Seq((1L, 100L), (2L, 3000L), (3L, 2000L), (4L, 100L))
      .toDF("id", "tok")
      .withColumn("cum", sum($"tok").over(
        Window.orderBy($"id").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    val got = df.select($"id",
        Ranking.shardByBudget($"cum", $"tok", 4096L).as("shard"))
      .as[(Long, Int)].collect().toSeq
    // starts: 0, 100, 3100, 5100 -> shards 0, 0, 0, 1
    assert(got == Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1)))
  }
}
