package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("salted aggregation equals plain aggregation (skewed key)") {
    val df = (1 to 10000).map(i => (if (i % 100 == 0) "rare" else "hot", i.toDouble))
      .toDF("k", "v").repartition(8)
    val salted = Skew.saltedAgg(df, "k", "v", saltFactor = 7)
      .orderBy("k").collect()
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
      assert(a.getLong(2) == b.getLong(2))
    }
  }

  test("salted join equals plain join, including multi-row matches") {
    val large = (1 to 5000).map(i => (if (i % 10 == 0) "k2" else "k1", i))
      .toDF("k", "v").repartition(8)
    val small = Seq(("k1", "alpha"), ("k2", "beta"), ("k1", "alpha2")).toDF("k", "tag")
    val salted = Skew.saltedJoin(large, small, "k", saltFactor = 5)
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k", "tag").collect()
    val plain = large.join(small, "k")
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k", "tag").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (a, b) => assert(a == b) }
  }
}
