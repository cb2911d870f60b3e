package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties the 100 TB story rests
  * on are plan properties, not result properties — a correct result from a
  * SortMergeJoin where a broadcast was intended, or a SortAggregate where
  * a HashAggregate was designed for, is a silent scale regression the
  * result-hash oracle cannot see. Each check pins the plan feature the
  * operator's Scaladoc claims.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize AQE so codegen markers and join choices are real
    df.queryExecution.executedPlan.toString
  }

  test("p01 exact dedup aggregates stay hash-based (no SortAggregate fallback)") {
    val plan = planOf("p01_exact_dedup")
    assert(!plan.contains("SortAggregate"), "digest dedup fell back to SortAggregate")
  }

  test("p04 minhash signatures aggregate hash-based over LONG mins") {
    val plan = planOf("p04_minhash_lsh")
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("SortAggregate"),
      "min over signature columns must stay fixed-width (LONG) for HashAggregate")
  }

  test("p20 contamination broadcasts the eval shingle set") {
    val plan = planOf("p20_contamination")
    assert(plan.contains("BroadcastHashJoin"),
      "eval set must broadcast — a shuffle join ships the corpus shingle stream")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("p21 tfidf broadcasts the vocab-sized DF table") {
    val plan = planOf("p21_tfidf")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q01 filter reaches the parquet scan (pushdown + pruned columns)") {
    val df = SparkEntry.queries("q01_filter_project")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), "no filters pushed to the scan")
    assert(scan.contains("ReadSchema"), "no read-schema pruning visible")
  }

  test("p07 bucketed ANN joins on the cell key, not a cross product") {
    val plan = planOf("p07_bucketed_ann")
    assert(!plan.contains("CartesianProduct"),
      "bucketed ANN must never degenerate to a cross join")
  }

  test("whole-stage codegen covers the text-stats pipeline") {
    // codegen'd spans print as "*(n) Operator" in executedPlan.toString
    val plan = planOf("p02_text_stats")
    assert(plan.contains("*("), "pure-expression text ops must stay inside codegen")
  }
}
