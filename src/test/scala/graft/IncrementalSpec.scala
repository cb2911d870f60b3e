package graft

import graft.ops.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.Incremental]]: latest-wins keyed merge (MERGE INTO shape)
  * and delete propagation with digest expansion.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("merge: every action arm, latest-version-wins, delta wins ties") {
    val base = Seq(
      (1L, 1L, "one"),   // carried
      (2L, 1L, "two"),   // updated by delta v2
      (3L, 1L, "three"), // deleted by tombstone v2
      (4L, 5L, "four"),  // delta v2 is STALE against base v5
      (5L, 1L, "five"),  // delta v1 ties -> delta wins (unchanged payload)
      (6L, 1L, "six")    // delta v2 identical payload -> unchanged
    ).toDF("k", "version", "text")
    val delta = Seq(
      (2L, 2L, "two'", false),
      (3L, 2L, "", true),
      (4L, 2L, "four'", false),
      (5L, 1L, "five", false),
      (6L, 2L, "six", false),
      (7L, 2L, "seven", false), // insert
      (8L, 2L, "", true)        // tombstone for a key base never had
    ).toDF("k", "version", "text", "tomb_flag")
    val out = Incremental
      .merge(base, delta, "k", "version", "tomb_flag", Seq("text"))
      .orderBy($"k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "carry", 1L, "one"),
      (2L, "update", 2L, "two'"),
      (3L, "delete", 2L, ""),
      (4L, "stale_skip", 5L, "four"),
      (5L, "unchanged", 1L, "five"),
      (6L, "unchanged", 2L, "six"),
      (7L, "insert", 2L, "seven"),
      (8L, "noop_delete", 2L, "")))
    // the merged corpus drops exactly the tombstoned keys
    val merged = Incremental
      .merge(base, delta, "k", "version", "tomb_flag", Seq("text"))
      .filter(!$"action".isin("delete", "noop_delete"))
      .select($"k").as[Long].collect().sorted
    assert(merged.toSeq == Seq(1L, 2L, 4L, 5L, 6L, 7L))
  }

  test("merge: multi-column payload change detection, null-safe") {
    val base = Seq((1L, 1L, Some("a"), Some(10)), (2L, 1L, None, Some(20)))
      .toDF("k", "version", "s", "n")
    val delta = Seq(
      (1L, 2L, Some("a"), Some(10), false), // identical incl. both columns
      (2L, 2L, None, Some(21), false)       // null-safe compare: n changed
    ).toDF("k", "version", "s", "n", "tomb")
    val out = Incremental.merge(base, delta, "k", "version", "tomb", Seq("s", "n"))
      .orderBy($"k").select($"action").as[String].collect()
    assert(out.toSeq == Seq("unchanged", "update"))
  }

  test("merge against a key-bucketed base shuffles ONLY the delta") {
    // the 100 TB contract in Incremental.merge's doc: a base laid out
    // bucketed by the merge key satisfies the join's distribution from its
    // scan, so a daily delta merge pays one delta-sized Exchange and
    // nothing corpus-sized
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-base")
    spark.sql("DROP TABLE IF EXISTS t_merge_base")
    (1 to 1000).map(i => (i.toLong, 1L, s"doc $i")).toDF("k", "version", "text")
      .write.format("parquet").option("path", dir.toString)
      .bucketBy(8, "k").sortBy("k").saveAsTable("t_merge_base")
    val base = spark.table("t_merge_base")
    val delta = (1 to 50).map(i => (i * 7L, 2L, s"doc ${i * 7} v2", false))
      .toDF("k", "version", "text", "tomb")
    val merged = Incremental.merge(base, delta, "k", "version", "tomb", Seq("text"))
    assert(merged.filter($"action" === "update").count() > 0)
    val plan = merged.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val fin = if (cut >= 0) plan.substring(0, cut) else plan
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(fin).length
    assert(exchanges == 1,
      s"bucketed base must not re-shuffle (want 1 Exchange, the delta):\n$fin")
  }

  test("delete propagation: digest expansion catches exact duplicates; anti-joins broadcast") {
    val corpus = Seq(
      (1L, "offending text"), (2L, "clean"), (3L, "offending text"),
      (4L, "also clean"), (5L, "offending text"), (6L, "clean")
    ).toDF("doc_id", "text")
    val requests = Seq(1L).toDF("doc_id")
    val purge = Incremental
      .expandDeletesByDigest(corpus, requests, "doc_id", md5($"text"))
    assert(purge.as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L),
      "every exact duplicate of the requested content must be purged")
    val after = Incremental.applyDeletes(corpus, purge, "doc_id")
    assert(after.select($"doc_id").as[Long].collect().sorted.toSeq
      == Seq(2L, 4L, 6L))
    // the purge set is request-scale: the anti-join must broadcast it and
    // ride the artifact's scan, not shuffle the corpus
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, got:\n$plan")
  }

  test("rollupMerge: untouched keys carry, new keys insert, sums exact") {
    val prev = Seq(("a", 3L, 30L), ("b", 2L, 20L)).toDF("k", "n", "c")
    val delta = Seq(("b", 1L, 5L), ("c", 4L, 40L)).toDF("k", "n", "c")
    val got = Incremental.rollupMerge(prev, delta, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 3L, 30L), ("b", 3L, 25L), ("c", 4L, 40L)))
    // folding three deltas == one-shot aggregate (the IVM exactness claim)
    val rows = Seq(("a", 1L), ("b", 2L), ("a", 3L), ("c", 4L), ("b", 5L),
      ("a", 6L)).toDF("k", "v")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("c"))
    val thirds = (0 to 2).map(r => agg(rows.where($"v" % 3 === r)))
    val inc = thirds.tail.foldLeft(thirds.head)(
      (acc, d) => Incremental.rollupMerge(acc, d, Seq("k")))
      .orderBy($"k").collect().toSeq
    assert(inc === agg(rows).orderBy($"k").collect().toSeq)
  }
}
