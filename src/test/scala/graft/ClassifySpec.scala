package graft

import graft.ops.Classify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Classify]]: binary multinomial Naive Bayes as exact
  * integer-quantized arithmetic — the countable quality classifier.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def seed = Seq(
    ("pos", "cite source verify archive cite"),
    ("pos", "source archive verify neutral"),
    ("neg", "click buy spam click click"),
    ("neg", "spam buy neutral click")
  ).toDF("cls", "text")

  test("separates held-out docs by their class vocabulary") {
    val w = Classify.nbWeights(seed, "cls", "text", "pos")
    val c = Classify.nbConsts(seed, "cls", "text", "pos")
    val apply = Seq(
      (1L, "verify cite archive"),
      (2L, "click spam buy"),
      (3L, "neutral")
    ).toDF("doc_id", "text")
    val out = Classify.nbScore(apply, "doc_id", "text", w, c, "pos", "neg")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) === "pos" && out(2L) === "neg")
  }

  test("score equals hand-computed quantized NB on a tiny corpus") {
    val w = Classify.nbWeights(seed, "cls", "text", "pos")
    val c = Classify.nbConsts(seed, "cls", "text", "pos")
    // t_pos = 9 tokens, t_neg = 9 tokens, joint vocab V = 8 -> t_c+V = 17
    // word 'cite': c_pos=2, c_neg=0
    val expected =
      math.round(math.log(3.0 / 17.0) * 1e6) - math.round(math.log(1.0 / 17.0) * 1e6)
    val got = w.where($"word" === "cite").head.getLong(1)
    assert(got === expected)
    // unknown-word weight and prior (balanced classes -> prior 0)
    val cr = c.head
    assert(cr.getLong(0) === 0L) // symmetric totals: qlog(1/17) - qlog(1/17)
    assert(cr.getLong(1) === 0L)
    // doc 'cite zzz' = w(cite) + w_unk + prior
    val s = Classify.nbScore(Seq((1L, "cite zzz")).toDF("doc_id", "text"),
      "doc_id", "text", w, c, "pos", "neg").head
    assert(s.getLong(2) === expected + cr.getLong(0) + cr.getLong(1))
    assert(s.getLong(1) === 2L)
  }

  test("a doc with no tokens scores the bare prior and is not dropped") {
    val seed2 = Seq(("pos", "a a a"), ("neg", "b")).toDF("cls", "text")
    val w = Classify.nbWeights(seed2, "cls", "text", "pos")
    val c = Classify.nbConsts(seed2, "cls", "text", "pos")
    val out = Classify.nbScore(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text", w, c, "pos", "neg").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 0L)
    assert(out.head.getLong(2) === c.head.getLong(1)) // prior only
  }

  test("apply side broadcasts the model (no corpus-scale shuffle for the join)") {
    val w = Classify.nbWeights(seed, "cls", "text", "pos")
    val c = Classify.nbConsts(seed, "cls", "text", "pos")
    val apply = (0 until 200).map(i => (i.toLong, s"verify doc $i"))
      .toDF("doc_id", "text")
    val plan = Classify.nbScore(apply, "doc_id", "text", w, c, "pos", "neg")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"model join must broadcast:\n$plan")
  }
}
