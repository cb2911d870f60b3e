package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Verify witness gate must turn a false (or null) self-asserted
  * invariant into a hard failure — a deliberately-broken witness row may
  * never be archived as rows-green (VERDICT r3 #2).
  */
class VerifySpec extends AnyFunSuite {
  private lazy val s = SparkTestBase.spark
  import scala.jdk.CollectionConverters._

  test("all witnesses true (or absent) passes") {
    import s.implicits._
    assert(Verify.checkWitness(Seq((1, true, true)).toDF("x", "parity_ok", "matches_flat")).isEmpty)
    assert(Verify.checkWitness(Seq((1, "a")).toDF("x", "y")).isEmpty)
    // a boolean column NOT named like a witness is ignored
    assert(Verify.checkWitness(Seq((1, false)).toDF("x", "is_big")).isEmpty)
  }

  test("a false witness fails and names the column") {
    import s.implicits._
    val msg = Verify.checkWitness(
      Seq((1, true), (2, false)).toDF("x", "symmetry_ok"))
    assert(msg.exists(_.contains("symmetry_ok")))
    assert(msg.exists(_.contains("1 row(s)")))
    assert(Verify.checkWitness(Seq((1, false)).toDF("x", "equivalent")).nonEmpty)
  }

  test("a NULL witness is a failure, not a silent pass") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("decode_ok", org.apache.spark.sql.types.BooleanType)))
    val df = s.createDataFrame(
      Seq(org.apache.spark.sql.Row(1, null)).asJava, schema)
    assert(Verify.checkWitness(df).nonEmpty)
  }
}
