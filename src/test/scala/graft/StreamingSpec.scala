package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bounded streaming hourly agg equals the batch aggregation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.runBounded(spark, dir, "t_s01", EventStreams.hourlyAgg)
      .orderBy(col("hour_ts"), col("event_type")).collect()
    val batch = EventStreams.hourlyAggBatch(graft.queries.Tables.t(spark, dir, "events"))
      .orderBy(col("hour_ts"), col("event_type")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("scrub-on-ingest stream equals the batch scrub, finds every planted span (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.runBoundedDocs(spark, dir, "t_s08",
        EventStreams.scrubStage(spark))
      .orderBy(col("doc_id")).collect()
    val batch = EventStreams.scrubStage(spark)(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy(col("doc_id")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
    // the augmentation plants exactly one email, one IP, one phone per doc
    assert(streamed.forall(_.getAs[Int]("n_pii") == 3))
  }

  test("quota admission stream equals the batch row_number window, cap respected (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.runBounded(spark, dir, "t_s19",
        EventStreams.quotaAdmit(cap = 2), outputMode = "append",
        noDataBatches = false)
      .orderBy(col("event_id")).collect()
    val batch = EventStreams.quotaAdmitBatch(cap = 2)(
        graft.queries.Tables.t(spark, dir, "events"))
      .orderBy(col("event_id")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
    // the quota actually binds: some (type, hour) groups hit the cap and
    // every admitted sequence stays within it
    assert(streamed.forall(r => r.getAs[Long]("admit_seq") <= 2L))
    assert(streamed.count(_.getAs[Long]("admit_seq") == 2L) > 0)
  }

  /** Run `body` with no-data micro-batches disabled: the quota stage's
    * pending processing-time idle timers otherwise keep the engine
    * cycling empty batches, and `processAllAvailable` never sees it go
    * idle. Timers still fire lazily on data-driven triggers.
    */
  private def withoutNoDataBatches[A](body: => A): A = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  test("quota state survives across micro-batches (MemoryStream, two triggers)")
  { withoutNoDataBatches {
    import spark.implicits._
    // same key in two separate micro-batches: the second batch must see
    // the first batch's admitted count in the state store and reject the
    // overflow — the property the single-batch oracle run can't witness
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val df = input.toDF.toDF("event_id", "event_type", "ts")
    input.addData((1L, "view", ts("2024-01-01 10:00:01")),
      (2L, "view", ts("2024-01-01 10:00:02")))
    val q = EventStreams.quotaAdmit(cap = 3)(df)
      .writeStream.format("memory").queryName("t_quota_state")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData((3L, "view", ts("2024-01-01 10:00:03")),
        (4L, "view", ts("2024-01-01 10:00:04")),
        (5L, "view", ts("2024-01-01 10:59:59")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("t_quota_state").orderBy(col("event_id")).collect()
    // batch 1 admits 1,2 (seq 1,2); batch 2 has room for ONE more in the
    // 10:00 hour — event 3 takes seq 3, event 4 is rejected; event 5 is
    // the same hour too (10:59) so it is rejected as well
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("admit_seq")).toSeq == Seq(1L, 2L, 3L))
  } }

  test("quota state is BOUNDED: idle hour counters leave the state store (processing-time timeout)")
  { withoutNoDataBatches {
    import spark.implicits._
    // (source, hour) keys grow with wall-clock time — the operator must
    // shed them or a long-running ingest leaks state forever. With a
    // tiny idle timeout and a real pause, the hour-10 counter expires on
    // the next trigger; only the freshly-touched hour-16 counter stays.
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val df = input.toDF.toDF("event_id", "event_type", "ts")
    val q = EventStreams.quotaAdmit(cap = 5, idleTimeout = "100 milliseconds")(df)
      .writeStream.format("memory").queryName("t_quota_ttl")
      .outputMode("append").start()
    try {
      input.addData((1L, "view", ts("2024-01-01 10:00:00")),
        (2L, "view", ts("2024-01-01 10:00:01")))
      q.processAllAvailable()
      Thread.sleep(1000) // let the hour-10 counter go idle past the timeout
      input.addData((3L, "view", ts("2024-01-01 16:00:00")))
      q.processAllAvailable() // hour-10 expires during this trigger
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1L,
        s"idle hour counter must leave the store: $stateRows rows")
    } finally q.stop()
    val out = spark.table("t_quota_ttl").orderBy(col("event_id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L),
      "expiry must not affect admissions")
  } }

  test("quota admits arbitrarily LATE arrivals — bounded state must not filter them")
  { withoutNoDataBatches {
    import spark.implicits._
    // regression (review finding): an event-time timeout's watermark
    // silently dropped >delay-late rows before the state function. A
    // first-ever event for a key, hours older than the global max, must
    // still be rate-limited — i.e. ADMITTED when its counter has room.
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val df = input.toDF.toDF("event_id", "event_type", "ts")
    val q = EventStreams.quotaAdmit(cap = 3)(df)
      .writeStream.format("memory").queryName("t_quota_late")
      .outputMode("append").start()
    try {
      input.addData((1L, "view", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // 3 h older than everything seen so far, different source
      input.addData((2L, "click", ts("2024-01-01 09:00:00")))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("t_quota_late").orderBy(col("event_id")).collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Long]("admit_seq"))).toSeq ==
      Seq((1L, 1L), (2L, 1L)),
      "a late first arrival must be admitted, not silently dropped")
  } }

  test("late-arrival audit stream equals the running-max window twin; lateness exists (sf0.001)") {
    import spark.implicits._
    val jitter = (df: org.apache.spark.sql.DataFrame) => df.withColumn("ts",
      timestamp_micros(unix_micros(col("ts")) +
        ((col("event_id").cast("long") * 2654435761L) % 601L - 300L) * 1000000L))
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.runBounded(spark, dir, "t_s20",
        ev => EventStreams.lateAudit(120)(jitter(ev)), outputMode = "append")
      .orderBy(col("event_id")).collect()
    val batch = EventStreams.lateAuditBatch(120)(
        jitter(graft.queries.Tables.t(spark, dir, "events")))
      .orderBy(col("event_id")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
    // the jitter makes the audit non-trivial: some rows are late, most
    // are not, and every late row carries a positive lag beyond tolerance
    val late = streamed.filter(_.getAs[Boolean]("is_late"))
    assert(late.nonEmpty && late.length < streamed.length / 2)
    assert(late.forall(_.getAs[Long]("lag_us") > 120000000L))
    assert(streamed.filterNot(_.getAs[Boolean]("is_late"))
      .forall(_.getAs[Long]("lag_us") == 0L))
  }

  test("late-audit state survives across micro-batches (MemoryStream, two triggers)") {
    import spark.implicits._
    // batch 2 delivers an event older than batch 1's running max by more
    // than the tolerance: only cross-batch state can flag it
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val df = input.toDF.toDF("event_id", "event_type", "ts")
    input.addData((1L, "view", ts("2024-01-01 10:00:00")),
      (2L, "view", ts("2024-01-01 10:30:00")))
    val q = EventStreams.lateAudit(300)(df)
      .writeStream.format("memory").queryName("t_late_state")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData((3L, "view", ts("2024-01-01 10:20:00")), // 10 min late
        (4L, "view", ts("2024-01-01 10:31:00")))             // on time
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("t_late_state").orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.getAs[Boolean]("is_late"), r.getAs[Long]("lag_us")))
    assert(out.toSeq == Seq((1L, false, 0L), (2L, false, 0L),
      (3L, true, 600000000L), (4L, false, 0L)))
  }

  test("near-dup stage beyond-broadcast gate: shuffled index join equals broadcast path") {
    // VERDICT r4 #8: when the corpus band index outgrows broadcast, the
    // stage must degrade to a shuffled stream-static join with identical
    // results. Apply the stage to a batch frame (it is DataFrame =>
    // DataFrame) so the join plan is assertable directly.
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx = graft.ops.Dedup.bandBuckets(docs, "doc_id", "text", 5, 12, 3)
    val viaBroadcast = EventStreams.nearDupStage(idx)(docs)
      .orderBy(col("doc_id"), col("partner"), col("band")).collect()
    val viaShuffle = EventStreams.nearDupStage(idx, broadcastLimit = 0)(docs)
    val rows = viaShuffle.orderBy(col("doc_id"), col("partner"), col("band")).collect()
    assert(rows.length == viaBroadcast.length && rows.length > 0)
    rows.zip(viaBroadcast).foreach { case (a, b) => assert(a == b) }
    val plan = viaShuffle.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val fin = if (cut >= 0) plan.substring(0, cut) else plan
    assert(!fin.contains("BroadcastHashJoin"),
      s"past the gate the index must not broadcast:\n$fin")
    assert(fin.contains("SortMergeJoin") || fin.contains("ShuffledHashJoin"),
      s"fallback must be a shuffled equi-join on (band, bucket):\n$fin")
  }

  test("near-dup regime 3: bucketed persisted index, no static-side exchange per trigger") {
    // §9.3's deployment-scale regime: the corpus band index persisted as a
    // (band, bucket)-bucketed table — its shuffle paid once at write time.
    // Proven here on the REAL per-trigger plan (StreamingQuery.explain of
    // the AvailableNow run): the join is a sort-merge whose static side is
    // the bucketed scan with NO Exchange above it — exactly ONE
    // "Exchange hashpartitioning" in the whole micro-batch plan, and it is
    // the probe (batch-sized) side. Rows identical to regimes 1 and 2.
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx = graft.ops.Dedup.bandBuckets(docs, "doc_id", "text", 5, 12, 3)
    val tblDir = java.nio.file.Files.createTempDirectory("graft-bandidx")
    spark.sql("DROP TABLE IF EXISTS t_band_idx")
    // build INCREMENTALLY: base layout from the even docs, the odd docs
    // appended as a delta under the same banding — the appended table
    // must be row-identical to a full rebuild AND keep the bucket
    // layout (the assertions below run against the appended files)
    graft.ops.Dedup.writeBandIndexTable(
      graft.ops.Dedup.bandBuckets(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", 5, 12, 3),
      "t_band_idx", tblDir.resolve("idx").toString, nBuckets = 8)
    graft.ops.Dedup.appendBandIndexTable(
      graft.ops.Dedup.bandBuckets(docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", 5, 12, 3),
      "t_band_idx", tblDir.resolve("idx").toString, nBuckets = 8)
    val appended = spark.table("t_band_idx")
      .orderBy(col("partner"), col("band"), col("bucket")).collect()
    val rebuilt = idx.select(col("doc").as("partner"), col("band"), col("bucket"))
      .orderBy(col("partner"), col("band"), col("bucket")).collect()
    assert(appended.length === rebuilt.length && appended.length > 0)
    appended.zip(rebuilt).foreach { case (a, b) => assert(a === b) }
    // reference rows: regime 1 (broadcast) on the same batch frame
    val viaBroadcast = EventStreams.nearDupStage(idx)(docs)
      .orderBy(col("doc_id"), col("partner"), col("band")).collect()

    // regime 3 on the batch frame: row equality + structural no-exchange
    val viaIndexed = EventStreams.nearDupStageIndexed(spark, "t_band_idx")(docs)
    val rows = viaIndexed.orderBy(col("doc_id"), col("partner"), col("band")).collect()
    assert(rows.length == viaBroadcast.length && rows.length > 0)
    rows.zip(viaBroadcast).foreach { case (a, b) => assert(a == b) }

    // regime 3 as an actual micro-batch: per-trigger plan from the query
    val ck = java.nio.file.Files.createTempDirectory("graft-ck-regime3")
    val stream = spark.readStream.schema(docs.schema)
      .parquet(s"$dir/documents.parque[t]")
    val q = EventStreams.nearDupStageIndexed(spark, "t_band_idx")(stream)
      .writeStream.format("memory").queryName("t_regime3")
      .outputMode("append")
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val baos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(baos)) { q.explain() }
    val full = baos.toString
    // AQE's explain appends the pre-adaptive "== Initial Plan ==" dump,
    // which repeats every node — assert on the final plan only
    val cut0 = full.indexOf("== Initial Plan ==")
    val plan = if (cut0 >= 0) full.substring(0, cut0) else full
    assert(plan.contains("Bucketed: true"),
      s"the static side must read its bucket layout:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"regime 3 must sort-merge against the bucketed index:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"the merge hint must pin the plan off regime 1's broadcast:\n$plan")
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1,
      s"exactly one exchange (the probe side) allowed per trigger, got $nExchanges:\n$plan")
    val streamedRows = spark.table("t_regime3")
      .orderBy(col("doc_id"), col("partner"), col("band")).collect()
    assert(streamedRows.length == viaBroadcast.length)
    streamedRows.zip(viaBroadcast).foreach { case (a, b) => assert(a == b) }
    spark.sql("DROP TABLE IF EXISTS t_band_idx")
  }

  test("charLM score-on-ingest stream equals the batch scorer (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.ops.TextOps.charLmModel(docs, "text")
    val streamed = EventStreams.runBoundedDocs(spark, dir, "t_s10",
        EventStreams.charLmStage(model), outputMode = "complete")
      .orderBy(col("doc_id")).collect()
    val batch = graft.ops.TextOps.charLmScore(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("incremental session windows merge within gap and split across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val q = EventStreams.sessionAgg(df.withColumn("event_id", lit(0L)))
      .writeStream.format("memory").queryName("t_sessions")
      .outputMode("complete").trigger(Trigger.AvailableNow())

    mem.addData(
      (ts("2024-01-01 10:00:00"), 1L, 1.0),
      (ts("2024-01-01 10:10:00"), 1L, 2.0),  // same session (10 min gap)
      (ts("2024-01-01 11:00:00"), 1L, 4.0),  // new session (50 min gap)
      (ts("2024-01-01 10:00:00"), 2L, 8.0))
    val run = q.start(); run.awaitTermination()

    val rows = spark.table("t_sessions")
      .orderBy($"user_id", $"session_start").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Long]("user_id") == 1L && rows(0).getAs[Long]("n_events") == 2L
      && rows(0).getAs[Double]("session_value") == 3.0)
    assert(rows(1).getAs[Long]("user_id") == 1L && rows(1).getAs[Long]("n_events") == 1L)
    assert(rows(2).getAs[Long]("user_id") == 2L && rows(2).getAs[Double]("session_value") == 8.0)
  }

  test("flatMapGroupsWithState: state accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val df = mem.toDF().toDF("user_id", "value")
    val q = EventStreams.runningUserTotals(df)
      .writeStream.format("memory").queryName("t_state")
      .outputMode("append")

    val run = q.start()
    mem.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
    run.processAllAvailable()
    mem.addData((1L, 5.0)) // second micro-batch: state must carry over
    run.processAllAvailable()
    run.stop()

    val rows = spark.table("t_state")
      .orderBy($"user_id", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // batch 1 emits (1, 2, 5.0) and (2, 1, 10.0); batch 2 emits (1, 3, 10.0)
    assert(rows == Seq((1L, 2L, 5.0), (1L, 3L, 10.0), (2L, 1L, 10.0)))
  }

  test("streaming dedup drops repeated event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStreams.dedup(df)
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow())
    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:01"), "click"),  // duplicate id
      (2L, ts("2024-01-01 10:00:02"), "view"))
    val run = q.start(); run.awaitTermination()
    assert(spark.table("t_dedup").count() == 2)
  }

  test("IVF route-on-ingest stream equals the batch assignment (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.ops.Similarity.ivfCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val streamed = EventStreams.runBoundedTable(spark, dir, "embeddings", "t_s13",
        EventStreams.ivfRouteStage(cents), spread = false)
      .orderBy(col("vec_id")).collect()
    val batch = emb.select(col("vec_id"),
        graft.ops.Similarity.nearestCell(col("embedding"), cents)
          .cast("long").as("cell"))
      .orderBy(col("vec_id")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
    // routing must scatter across cells, not collapse to one
    assert(streamed.map(_.getLong(1)).distinct.length > 1)
  }

  test("media featurize-on-ingest stream equals the batch decode, stateless plan (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.runBoundedDocs(spark, dir, "t_s17",
        EventStreams.mediaFeatureStage)
      .orderBy(col("doc_id")).collect()
    // batch twin: the SAME stage over a static read
    val batch = EventStreams.mediaFeatureStage(
        spark.read.parquet(s"$dir/documents.parquet"))
      .orderBy(col("doc_id")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
    // all three modalities must appear and route off the stub
    assert(streamed.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("flac", "image", "video"))
    // stateless claim: per-row decode keeps no state store in the stream
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = EventStreams.mediaFeatureStage(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("StateStore"), "media stage must be stateless")
  }

  test("hll registers merge across micro-batches (MemoryStream, two triggers)") {
    import spark.implicits._
    // the streaming aggregation must MERGE batch-2 values into batch-1
    // state (max per register), not restart: after both triggers the
    // register table equals the batch sketch over the union — which a
    // single-trigger run can't witness
    val input = MemoryStream[(String, String)](spark)
    val df = input.toDF.toDF("g", "v")
    val b1 = (1 to 400).map(i => ("g", s"a$i"))
    val b2 = (1 to 400).map(i => ("g", s"b$i"))
    input.addData(b1: _*)
    val q = graft.ops.Sketch.hllRegisters(df, Seq("g"), "v", p = 9)
      .writeStream.format("memory").queryName("t_hll_state")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("t_hll_state").count()
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(spark.table("t_hll_state").count() >= afterB1) // registers only grow
    } finally q.stop()
    val streamed = spark.table("t_hll_state")
      .orderBy(col("idx")).collect().map(_.toSeq).toSeq
    val batch = graft.ops.Sketch.hllRegisters(
        (b1 ++ b2).toDF("g", "v"), Seq("g"), "v", p = 9)
      .orderBy(col("idx")).collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("histogram bins and CMS cells SUM-merge across micro-batches (MemoryStream, two triggers)") {
    import spark.implicits._
    // the count-based sketches must ACCUMULATE batch-2 occurrences into
    // batch-1 state (sum per bin/cell), not restart: after both triggers
    // each table equals the batch sketch over the union — which a
    // single-trigger run can't witness
    val b1 = (1 to 300).map(i => ("g", (i % 50).toDouble, s"tok${i % 7}"))
    val b2 = (1 to 300).map(i => ("g", (i % 80).toDouble, s"tok${i % 11}"))
    val input = MemoryStream[(String, Double, String)](spark)
    val df = input.toDF.toDF("g", "x", "v")
    input.addData(b1: _*)
    val qh = graft.ops.Sketch.histogramSketch(df, Seq("g"), "x", 0.0, 100.0, 16)
      .writeStream.format("memory").queryName("t_hist_state")
      .outputMode("complete").start()
    val qc = graft.ops.Sketch.cmsSketch(df, Seq("g"), "v", depth = 3, width = 32)
      .writeStream.format("memory").queryName("t_cms_state")
      .outputMode("complete").start()
    try {
      qh.processAllAvailable(); qc.processAllAvailable()
      input.addData(b2: _*)
      qh.processAllAvailable(); qc.processAllAvailable()
    } finally { qh.stop(); qc.stop() }
    val all = (b1 ++ b2).toDF("g", "x", "v")
    val histStream = spark.table("t_hist_state")
      .orderBy(col("bin")).collect().map(_.toSeq).toSeq
    val histBatch = graft.ops.Sketch.histogramSketch(all, Seq("g"), "x", 0.0, 100.0, 16)
      .orderBy(col("bin")).collect().map(_.toSeq).toSeq
    assert(histStream == histBatch && histStream.nonEmpty)
    val cmsStream = spark.table("t_cms_state")
      .orderBy(col("row"), col("col")).collect().map(_.toSeq).toSeq
    val cmsBatch = graft.ops.Sketch.cmsSketch(all, Seq("g"), "v", depth = 3, width = 32)
      .orderBy(col("row"), col("col")).collect().map(_.toSeq).toSeq
    assert(cmsStream == cmsBatch && cmsStream.nonEmpty)
  }

  test("html extract-on-ingest stream equals the batch chain and inverts the mangle (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStreams.runBoundedDocs(spark, dir, "t_s21",
        EventStreams.htmlIngestStage)
      .orderBy(col("doc_id")).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = EventStreams.htmlIngestStage(docs).orderBy(col("doc_id")).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
    // extraction must invert wrapFixture: text == 12-token paragraph chunks
    val expected = docs.collect().map { r =>
      val id = r.getAs[Long]("doc_id")
      id -> r.getAs[String]("text").split(" ").filter(_.nonEmpty)
        .grouped(graft.ops.Html.ParagraphTokens).map(_.mkString(" ")).mkString("\n")
    }.toMap
    streamed.foreach { r =>
      assert(r.getString(2) == expected(r.getLong(0)), s"doc ${r.getLong(0)}")
      assert(r.getInt(4) == graft.ops.Html.FixtureBoilerBlocks)
    }
    // stateless: extraction rides the micro-batch plan, no state store
    val plan = EventStreams.htmlIngestStage(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("StateStore"), "html stage must be stateless")
  }

  test("kmv state re-ranks across micro-batches (MemoryStream, two triggers)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // k=8 with 10 tokens in batch 1 and 12 more in batch 2: the second
    // trigger MUST evict members of the first snapshot whenever a smaller
    // hash arrives — only cross-batch state can produce the final k-mins
    val input = MemoryStream[(String, String)](spark)
    val df = input.toDF.toDF("source", "text")
    input.addData(("w", "aa bb cc dd ee ff gg hh ii jj"))
    val q = EventStreams.kmvSketchState(8)(df)
      .writeStream.format("memory").queryName("t_kmv_state")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData(("w", "kk ll mm nn oo pp qq rr ss tt uu vv"))
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("t_kmv_state")
    // two snapshots of exactly k rows each
    assert(sink.count() == 16L)
    // recover the final sketch from the snapshot union (the s26 recipe)
    // and check the estimate equals the one-shot batch KMV over all rows
    val kept = sink.distinct()
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("__r") <= 8).select(col("source"), col("h").as("__h"))
    val got = graft.ops.Sketch.kmvEstimate(kept, "source", 8)
      .collect().map(_.toSeq).toSeq
    val all = ("aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv")
      .split(" ").toSeq.map(("w", _)).toDF("source", "v")
    val want = graft.ops.Sketch.kmvDistinct(all, "source", "v", k = 8)
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"streamed sketch $got != batch sketch $want")
  }
}
