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

  /** The returned frame's final executed plan — right for queries whose
    * interesting plan IS the result plan. Operators that seal-and-release
    * (LAZY localCheckpoint + deferred cache release, VERDICT r5 #5 via
    * CacheHygiene) return a LogicalRDD scan whose interesting plan runs
    * as the checkpoint's own execution at first action; assert those with
    * [[allPlansOf]], which captures every execution the collect triggers.
    */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize AQE so codegen markers and join choices are real
    // AQE prints "== Final Plan ==" followed by "== Initial Plan ==" — keep
    // only the final section so contains/count asserts never double-see a
    // node that AQE planned away (or count one twice)
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  /** Every executed plan the query triggers (QueryExecutionListener
    * capture, async bus polled until quiet), concatenated — sees the
    * internal executions a sealed operator runs before returning.
    */
  private def allPlansOf(name: String): String = {
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE so codegen markers and join choices are real
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var last = -1
      while (plans.size() != last && System.nanoTime() < deadline) {
        last = plans.size()
        Thread.sleep(250)
      }
      // AQE prints "== Final Plan ==" followed by "== Initial Plan ==" —
      // keep only each final section so contains/count asserts never see a
      // node AQE planned away (or count one twice)
      def finalOnly(s: String): String = {
        val cut = s.indexOf("== Initial Plan ==")
        if (cut >= 0) s.substring(0, cut) else s
      }
      import scala.jdk.CollectionConverters._
      // the collect() above is itself captured by the listener — fall back
      // to the frame's own plan only if the async bus dropped everything
      val all = plans.asScala.map(finalOnly).toSeq
      if (all.nonEmpty) all.mkString("\n--- execution ---\n")
      else finalOnly(df.queryExecution.executedPlan.toString)
    } finally spark.listenerManager.unregister(listener)
  }

  test("p50 bucketed co-located join plans with no exchange below the rollup") {
    // the plan property the driver's value-oracle can't see: with both
    // sides bucketed on the join key, the join and the first aggregation
    // consume the bucketing — ZERO shuffles until the final tiny rollup
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket-plan").toString
    spark.sql("DROP TABLE IF EXISTS gbp_orders")
    spark.sql("DROP TABLE IF EXISTS gbp_lineitem")
    // at sf0.001 AQE would broadcast either side; the bucketing story is for
    // the regime where BOTH sides are too big for that — model it by
    // disabling broadcast for this plan check
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.queries.Tables.t(spark, sf, "orders").write.format("parquet")
        .option("path", s"$dir/orders")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("gbp_orders")
      graft.queries.Tables.t(spark, sf, "lineitem").write.format("parquet")
        .option("path", s"$dir/lineitem")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("gbp_lineitem")
      val joined = spark.sql(
        """SELECT o_orderkey, count(*) AS n
          |FROM gbp_orders JOIN gbp_lineitem ON l_orderkey = o_orderkey
          |GROUP BY o_orderkey""".stripMargin)
      joined.collect()
      val s = joined.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      val plan = if (cut >= 0) s.substring(0, cut) else s
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should need no shuffle at all:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan did not use bucketing:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS gbp_orders")
      spark.sql("DROP TABLE IF EXISTS gbp_lineitem")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q39 fuzzy keys join on the blocking key, not a cross product") {
    val plan = planOf("q39_fuzzy_keys")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy verify must run inside blocks only:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the block key:\n$plan")
  }

  test("p01 exact dedup aggregates stay hash-based (no SortAggregate fallback)") {
    val plan = planOf("p01_exact_dedup")
    assert(!plan.contains("SortAggregate"), "digest dedup fell back to SortAggregate")
  }

  test("p04 minhash signatures aggregate hash-based over LONG mins") {
    val plan = allPlansOf("p04_minhash_lsh")
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

  test("p114 robots rule table broadcasts into the page corpus") {
    val plan = planOf("p114_robots_optout")
    assert(plan.contains("BroadcastHashJoin"),
      "registry-sized rule table must broadcast — a shuffle join ships the page corpus")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-scale sort-merge in the verdict election")
  }

  test("p120 phrase search broadcasts query terms; no corpus-scale join") {
    val plan = planOf("p120_phrase_search")
    assert(plan.contains("BroadcastHashJoin"),
      "query terms/lengths must broadcast into the postings stream")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "the corpus must never shuffle for the term match")
  }

  test("p118 sequence packing: one shard exchange, no windows, no joins") {
    val plan = planOf("p118_sequence_packing")
    assert(plan.contains("hashpartitioning(shard"),
      "the shard key is the one exchange packing needs")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      "packing is a partition-local fold — no windows, no joins")
  }

  test("p121 winnowing is a pure per-row chain (no joins, no windows)") {
    val plan = planOf("p121_winnow_fingerprints")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "fingerprinting must ride the scan")
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

  test("q21 asof join is one window pass, never a join operator") {
    val plan = planOf("q21_asof_join")
    assert(plan.contains("Window"), "asof must compose as a window, not a join")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop")
      && !plan.contains("CartesianProduct"),
      "asof decomposed into a per-key join — the per-key candidate blowup returned")
  }

  test("p26 kmv sketch aggregates stay hash-based") {
    val plan = planOf("p26_kmv_distinct")
    assert(!plan.contains("SortAggregate"),
      "the distinct/count stages must stay fixed-width HashAggregate")
  }

  test("p87/p89 sketch builds stay hash-based; p90 probes broadcast") {
    // register/bin/cell builds are fixed-width groupBys — a SortAggregate
    // here would sort the exploded value stream instead of combining
    // map-side
    val p87 = planOf("p87_hll_distinct")
    assert(!p87.contains("SortAggregate"), "hll registers must HashAggregate")
    val p89 = planOf("p89_histogram_quantiles")
    assert(!p89.contains("SortAggregate"), "histogram bins must HashAggregate")
    val p90 = planOf("p90_cms_heavyhitters")
    assert(!p90.contains("SortAggregate"), "cms cells must HashAggregate")
    // the probe set is sketch-scale: its joins must broadcast, never
    // shuffle the sketch
    assert(p90.contains("BroadcastHashJoin") || p90.contains("BroadcastNestedLoopJoin"),
      "cms probes must broadcast")
  }

  private def countOf(plan: String, marker: String): Int =
    plan.sliding(marker.length).count(_ == marker)

  test("p28 PII redaction is per-row: no hash shuffle, stays in codegen") {
    val plan = planOf("p28_pii_redact")
    assert(!plan.contains("Exchange hashpartitioning"),
      "redaction is a scan-side map — a hash shuffle means a grouping crept in")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("*("), "chained regexp_replace must stay inside codegen")
  }

  test("p31 NFC normalization stays inside whole-stage codegen, no shuffle") {
    val plan = planOf("p31_nfc_normalize")
    assert(!plan.contains("Exchange hashpartitioning"))
    assert(plan.contains("*("),
      "NfcNormalize.doGenCode must keep the normalize call in the codegen span")
  }

  test("p29/p30 per-source windows shuffle (source) exactly once") {
    for (q <- Seq("p29_source_cap", "p30_seq_packing")) {
      val plan = planOf(q)
      assert(plan.contains("Window"), s"$q must rank/sum via a window")
      assert(countOf(plan, "Exchange hashpartitioning") <= 1,
        s"$q re-shuffles between the window and output:\n$plan")
      assert(!plan.contains("SortMergeJoin"))
    }
  }

  test("p32 line dedup: hash aggregates, never a cross product") {
    val plan = planOf("p32_line_dedup")
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "chunk-frequency join must key on chunk, not enumerate pairs")
  }

  test("p35 bloom prune: corpus scan filters per-row, residual join broadcasts") {
    val plan = planOf("p35_bloom_blocklist")
    assert(!plan.contains("SortMergeJoin"),
      "blocklist residual must broadcast (candidates are bloom-bounded), not shuffle the corpus")
    assert(plan.contains("might_contain"),
      "the bloom predicate must appear as a scan-side filter")
  }

  test("p37 BPE encode is a single scan: merge chain stays in codegen, no shuffle") {
    val plan = planOf("p37_bpe_encode")
    assert(!plan.contains("Exchange hashpartitioning"),
      "apply-time encoding must not shuffle — the merge table is in the expression tree")
    assert(plan.contains("*("), "replace chain must stay inside codegen")
  }

  test("p43/p44 sampling and chunking stay scan-side: no data shuffle") {
    // both are per-row decisions — the only allowed Exchange is the output
    // ORDER BY's rangepartitioning (presentation, not operator cost)
    for (name <- Seq("p43_weighted_sample", "p44_chunk_overlap")) {
      val plan = planOf(name)
      val kinds = "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(kinds.forall(_.startsWith("rangepartitioning")),
        s"$name shuffles data: $kinds")
    }
  }

  test("p74/p75 media decode stays scan-side: only the spread and the output sort shuffle") {
    // decode is per-row codec CPU — the only allowed Exchanges are the
    // documented fixture-spread repartition (round-robin, pre-decode) and
    // the output ORDER BY's rangepartitioning (presentation)
    for (name <- Seq("p74_video_decode", "p75_video_keyframes")) {
      val plan = planOf(name)
      val kinds = "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(kinds.nonEmpty && kinds.forall(k =>
        k.toLowerCase.startsWith("rangepartitioning") ||
        k.toLowerCase.startsWith("roundrobin")),
        s"$name shuffles data beyond spread+sort: $kinds")
    }
  }

  test("p41 url dedup shuffles exactly once on the canonical key") {
    val plan = planOf("p41_url_dedup")
    val hashEx = "Exchange (hashpartitioning\\([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(hashEx.length == 1 && hashEx.head.contains("canon_url"),
      s"expected one canon_url shuffle, saw $hashEx")
  }

  test("q30 qualify: one window pass, dimension broadcast, marker pruned from output") {
    val df = SparkEntry.queries("q30_qualify")(spark, sf)
    df.collect()
    assert(!df.columns.contains("__graft_qualify"))
    val plan = planOf("q30_qualify")
    assert("(?m)^\\s*[*+\\-: ]*Window ".r.findAllIn(plan).length == 1,
      "QUALIFY must fold into exactly one Window operator")
    assert(plan.contains("BroadcastHashJoin"), "segment dimension must broadcast")
  }

  test("p46 profile hash-reduces the exploded stream (no Expand/SortAggregate cascade)") {
    // the rejected shape (k countDistincts + string min/max in one agg)
    // plans as SortAggregate over an Expand of the whole corpus — 11×
    // slower at sf0.1; the long-format shape must keep the corpus-width
    // stage a HashAggregate behind a Generate
    val plan = planOf("p46_profile")
    assert(!plan.contains("Expand"), "profile regressed to the Expand cascade")
    assert(plan.contains("Generate") && plan.contains("HashAggregate"))
  }

  test("sweep: no pipeline query degenerates to a cross product (allowlisted brute force)") {
    // p06 is the documented brute-force correctness baseline (broadcast
    // cross join by design); p19/p36 probe tiny driver-bounded tables
    // (centroids / 1-row top-pair) where a broadcast nested loop over a
    // fixed-size side is the intended plan. Everything else must never
    // enumerate pairs.
    // p65 embeds the brute-force baseline BY DEFINITION: it is the recall
    // evaluation of the index against exhaustive ground truth on a bounded
    // query sample
    val allowCross = Set("p06_brute_topk", "p19_ivf_ann", "p36_bpe_merges",
      "p37_bpe_encode", "p65_ann_recall")
    val names = SparkEntry.queries.keys.filter(_.startsWith("p")).toSeq.sorted
    for (name <- names if !allowCross(name)) {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name degenerated to a cartesian product")
    }
  }

  test("bucketed tables co-locate the join: no exchange on either side") {
    // The 100 TB fact-fact join answer: both sides written bucketed by the
    // key means the sort-merge join reads pre-partitioned buckets and the
    // plan has NO Exchange — the shuffle happened once at write time, not
    // once per query.
    val spark0 = spark
    import spark0.implicits._
    spark.sql("DROP TABLE IF EXISTS bkt_a"); spark.sql("DROP TABLE IF EXISTS bkt_b")
    // a table dir orphaned by an earlier aborted run blocks saveAsTable even
    // after DROP (the fresh metastore never knew it) — clear the locations
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("bkt_a", "bkt_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    (1 to 10000).map(i => (i.toLong % 997, i.toLong)).toDF("k", "va")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_a")
    (1 to 5000).map(i => (i.toLong % 997, i * 2.0)).toDF("k", "vb")
      .write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_b")
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"vb").as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("p54 hamming ANN broadcasts the query set; top-k is a partial aggregate, not a window") {
    val plan = planOf("p54_hamming_ann")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query set must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"corpus must stream past the broadcast, not shuffle:\n$plan")
    // the scale property: TopKMinPairs gets map-side partial aggregation —
    // each task ships <= k pairs per query, where a row_number window
    // would co-locate ALL N scored rows per query on one reducer
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_topk_min_pairs"),
      s"top-k must partial-aggregate map-side:\n$plan")
    assert(!plan.contains("Window"), s"top-k must not fall back to a window:\n$plan")
  }

  test("p07/p19/p52 ANN top-k is a partial aggregate, not a window (VERDICT r4 #3)") {
    // same property as the p54 gate, for the remaining ANN entry points: a
    // row_number window would co-locate every scored row of a query on one
    // reducer; TopKMinPairs partial-aggregates each task's slice to <= k
    for (q <- Seq("p06_brute_topk", "p07_bucketed_ann", "p19_ivf_ann", "p52_pq_ann",
        "p84_exact_k_sample")) {
      val plan = planOf(q)
      assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_topk_min_pairs"),
        s"$q top-k must partial-aggregate map-side:\n$plan")
      assert(!plan.contains("Window"),
        s"$q top-k must not fall back to a window:\n$plan")
    }
  }

  test("p64 ivfadc layout serves probes from a pruned code scan with no float column") {
    val plan = planOf("p64_ivfadc_layout")
    // the corpus side must be the PERSISTED code table: partition-pruned on
    // the probed cells, reading (nid, c0..c3) — the float embedding column
    // appears only in the tiny query-side scan (pushed-filter vec_id < 50)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"coded scan must carry a cell partition filter:\n$plan")
    val codedScan = plan.linesIterator
      .find(l => l.contains("graft-ivfadc") && l.contains("FileScan"))
    assert(codedScan.isDefined, s"expected a FileScan over the code layout:\n$plan")
    assert(!codedScan.get.contains("embedding"),
      s"code scan must not read the float-vector column:\n${codedScan.get}")
    assert(plan.contains("partial_topk_min_pairs") && !plan.contains("Window"),
      s"top-k must stay the bounded aggregate:\n$plan")
  }

  test("hive-partitioned layout: status filter becomes a partition filter (q42 shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hivepart-plan")
    try {
      val spark0 = spark
      import spark0.implicits._
      graft.queries.Tables.t(spark, sf, "orders")
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice", $"o_orderstatus")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(s"$dir/ord")
      val df = spark.read.parquet(s"$dir/ord")
        .filter($"o_orderstatus" === "F")
        .groupBy($"o_orderpriority").count()
      df.collect()
      val s0 = df.queryExecution.executedPlan.toString
      val cut = s0.indexOf("== Initial Plan ==")
      val plan = if (cut >= 0) s0.substring(0, cut) else s0
      assert("PartitionFilters: \\[[^\\]]*o_orderstatus".r.findFirstIn(plan).isDefined,
        s"status filter must prune partition directories, not filter rows:\n$plan")
      val all = new java.io.File(s"$dir/ord").list().count(_.startsWith("o_orderstatus="))
      assert(all > 1, "fixture must have several status partitions for pruning to mean anything")
    } finally {
      import scala.jdk.CollectionConverters._
      val all = java.nio.file.Files.walk(dir).iterator().asScala.toSeq
      all.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_: java.nio.file.Path))
    }
  }

  test("p55 decontamination broadcasts the eval band index") {
    val plan = allPlansOf("p55_decontaminate_neardup")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval band index must broadcast into the train probe:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"band join must stay an equi-join:\n$plan")
  }

  test("p58 bm25 broadcasts query terms, df table and corpus stats; aggs stay hash") {
    val plan = allPlansOf("p58_bm25_topk")
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortAggregate"),
      s"tf/dl aggregation must stay a HashAggregate:\n$plan")
  }

  test("s13 ivf route stage is stateless: no state store operator in the stream plan") {
    // the streamed result's lineage is a memory-sink table; assert on the
    // stage's batch shape instead — pure project over the scan, no
    // aggregate, no join
    val d = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val cents = graft.ops.Similarity.ivfCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 1)
    val staged = graft.streaming.EventStreams.ivfRouteStage(cents)(emb)
    staged.collect()
    val plan = staged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") &&
      !plan.contains("Aggregate"),
      s"route stage must be a per-row project only:\n$plan")
  }

  test("p98 boilerplate strip broadcasts the per-source verdict arrays") {
    // the application join must be a broadcast (the verdict table is a
    // host's boilerplate vocabulary — tiny no matter the corpus size);
    // a shuffled join here would re-exchange the corpus to clean it
    val plan = planOf("p98_boilerplate_strip")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"verdict join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must never sort-merge for the strip:\n$plan")
  }

  test("p103 domain blocklist joins the chain on suffix equality, broadcast") {
    val plan = planOf("p103_domain_blocklist")
    assert(plan.contains("BroadcastHashJoin"),
      s"registry join must be a broadcast equality join:\n$plan")
    assert(plan.contains("Generate") || plan.contains("explode"),
      s"hosts must explode into their bounded chain (no LIKE scan):\n$plan")
  }
}
