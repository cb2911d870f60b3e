package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Streams are first-class in this engine even though the reference has none
  * (SURVEY §2B "not present"): a training-data pipeline ingests continuously.
  * Each transform is defined once against a DataFrame — the SAME function
  * serves batch (`spark.read`) and streaming (`spark.readStream`) inputs,
  * which is how the batch oracle validates the streaming path: run the
  * transform over a file stream with Trigger.AvailableNow, sink to memory,
  * and the result must equal the batch run DuckDB-checks.
  */
object EventStreams {

  /** Cross-micro-batch per-user accumulator for [[runningUserTotals]]. */
  final case class UserState(nEvents: Long, totalValue: Double)

  private def hourlyCore(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"), col("n"), col("total_value"))

  private def sessionCore(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Tumbling 1-hour windowed counts/sums per event type. Watermark bounds
    * state at scale; window start doubles as the hour bucket.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    hourlyCore(events.withWatermark("ts", "1 hour"))

  /** The identical transform over a static DataFrame — the batch twin the
    * oracle validates directly.
    */
  def hourlyAggBatch(events: DataFrame): DataFrame = hourlyCore(events)

  /** Gap-based sessionization (30 min) with the native session_window —
    * the streaming analogue of the batch lag+cumsum sessionizer (q15).
    */
  def sessionAgg(events: DataFrame): DataFrame =
    sessionCore(events.withWatermark("ts", "1 hour"))

  def sessionAggBatch(events: DataFrame): DataFrame = sessionCore(events)

  /** Exactly-once event dedup by key within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  private def intervalJoinCore(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    purchases.join(views,
      expr("p_user = v_user AND v_ts >= p_ts - INTERVAL 10 MINUTES AND v_ts <= p_ts"))
  }

  /** Stream-stream interval self-join: each purchase joined to the same
    * user's views in the preceding 10 minutes. Both branches derive from
    * one watermarked source; the event-time range predicate is what lets
    * Spark BOUND the join state — buffered rows older than
    * watermark + interval are dropped, so state never grows with the
    * stream (the non-negotiable property of a 100 TB streaming join).
    */
  def intervalJoin(events: DataFrame): DataFrame =
    intervalJoinCore(events.withWatermark("ts", "1 hour"))

  def intervalJoinBatch(events: DataFrame): DataFrame = intervalJoinCore(events)

  /** Per-user running state via flatMapGroupsWithState: cumulative event
    * count + value sum, emitting one updated row per user per micro-batch.
    * The custom-state escape hatch for semantics windows/aggregations can't
    * express (KeyValueGroupedDataset state machine; state survives across
    * micro-batches).
    *
    * State retention: deliberately NO timeout — the semantics are
    * LIFETIME totals, and expiring an idle user would silently reset
    * their count on re-appearance. State size is one (Long, Double) per
    * distinct user ever seen; at a scale where that outgrows the store,
    * the operator's contract itself has to change (e.g. TTL'd totals via
    * a processing-time timeout, as [[quotaAdmit]] does for its
    * naturally-expiring hour keys, or periodic snapshot-and-reseed).
    */
  def runningUserTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.nEvents; var tot = prev.totalValue
          rows.foreach { case (_, v) => n += 1; tot += v }
          state.update(UserState(n, tot))
          Iterator((userId, n, math.round(tot * 10000.0) / 10000.0))
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** Boilerplate-strip-on-ingest: the per-source boilerplate line table is
    * discovered OFFLINE over the standing corpus (the CCNet recipe — a
    * host's nav/footer vocabulary changes on crawl cadence, not per page)
    * and broadcast into the micro-batch plan as hashed line keys; each
    * arriving page drops its source's boilerplate lines inside the scan
    * stage. Stateless — no state store, no watermark; ingest throughput is
    * split+filter throughput. `mkPage` builds the page column from the
    * streamed document row (the fixture synthesizer in the driver query;
    * a real deployment feeds `html_text` output).
    */
  def boilerplateStage(bp: DataFrame, mkPage: Column)(docs: DataFrame): DataFrame = {
    val pages = docs.select(col("doc_id"), col("source"), mkPage.as("page"))
    graft.ops.Hygiene.stripBoilerplate(
        pages, bp, "source", "doc_id", "page", hashLines = true)
      .select(col("doc").as("doc_id"), col("source"), col("n_lines"),
        col("n_kept"), md5(col("clean")).as("clean_digest"))
  }

  /** Stream a document table into a manifest-pinned snapshot series: each
    * non-empty micro-batch commits as ONE snapshot version through
    * [[graft.ops.Layout.appendSnapshot]] — data files land append-only
    * under the base, then the manifest's write-then-atomic-move publishes
    * them. This is the streaming half of the p101 contract: ingest lands
    * crawl batches continuously while every downstream trainer keeps
    * reading the version it pinned; a batch that fails mid-write leaves
    * unreferenced files, never a corrupt visible version, because
    * visibility IS the manifest move. Empty micro-batches (AvailableNow
    * bookkeeping) commit nothing. Returns the number of versions
    * committed.
    *
    * Replay idempotence: foreachBatch is AT-LEAST-ONCE — a crash after
    * the manifest's atomic move but before the checkpoint offset commit
    * re-runs the same batch on restart. The committing `batchId` is
    * therefore stamped into the manifest, and `appendSnapshot` skips the
    * commit when the latest manifest already carries it — so a replayed
    * batch can never publish a duplicate version (RecoverySpec replays a
    * committed batch and pins version count + content unchanged).
    */
  def snapshotIngest(spark: SparkSession, dir: String, table: String,
                     base: java.nio.file.Path, filesPerBatch: Int = 2): Int = {
    val staticDf = spark.read.parquet(s"$dir/$table.parquet")
    val stream = spark.readStream
      .schema(staticDf.schema)
      .parquet(s"$dir/$table.parque[t]")
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", base.resolve("_chk").toString)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        if (!df.isEmpty)
          graft.ops.Layout.appendSnapshot(base, df, filesPerBatch,
            batchId = Some(batchId)): Unit
      }
      .start()
    q.awaitTermination()
    graft.ops.Layout.snapshotVersions(base).size
  }

  /** Streaming observability: `observe` metrics emitted per micro-batch
    * (the production ingest-monitoring hook — row counts and byte volumes
    * ride the existing plan as accumulator-style aggregates, costing no
    * extra pass and no extra action) accumulated across the run from the
    * query's progress records. Returns one (metric, observed) row per
    * metric, where `observed` is the cross-batch SUM — which must equal
    * the batch-engine aggregate over the same input, the invariant the
    * driver oracle checks. Progress is read synchronously from
    * `recentProgress` after termination (a listener would race the
    * async event bus).
    */
  def observedIngestTotals(spark: SparkSession, dir: String,
                           name: String): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val staticDf = spark.read.parquet(s"$dir/documents.parquet")
    val stream = spark.readStream
      .schema(staticDf.schema)
      .parquet(s"$dir/documents.parque[t]")
      .observe(name,
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("n_chars"),
        count(col("lang")).as("n_lang_nonnull"))
    val q = stream.writeStream
      .format("noop")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"graft-$name").toString)
      .start()
    q.awaitTermination()
    val perBatch = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get(name)))
    val cols = Seq("n_docs", "n_chars", "n_lang_nonnull")
    cols.map(c => c -> perBatch.map { r =>
      val v = r.getAs[Any](c)
      if (v == null) 0L else v.asInstanceOf[Long]
    }.sum)
  }

  /** KMV sketch as CUSTOM streaming state: the k smallest distinct token
    * hashes per source. HLL/histogram/CMS state (s22-s24) rides the
    * streaming AGGREGATION because max/sum are algebraic; a k-min SET is
    * not, so it takes the state-store escape hatch: a bounded TreeSet per
    * key (≤ k+1 longs live at any moment BY CONSTRUCTION — a batch hash
    * only enters if it beats the current k-th), updated per micro-batch by
    * flatMapGroupsWithState, emitting the sketch rows after each batch.
    *
    * Batch-side recovery from a multi-batch sink is exact: a hash leaves
    * the sketch only by being OUT-RANKED, so the k smallest of the union
    * of emitted snapshots equal the k smallest of everything seen — the
    * final sketch, hence the batch oracle, survives snapshot mixing.
    */
  def kmvSketchState(k: Int)(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"),
        explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .select(col("source"), graft.ops.Sketch.hash60(col("token")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (String, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (src, rows, state: GroupState[Array[Long]]) =>
          val set = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(set.add(_)))
          rows.foreach { case (_, h) =>
            if (set.size < k) set.add(h): Unit
            else if (h < set.last) {
              set.add(h): Unit
              if (set.size > k) set.pollLast(): Unit
            }
          }
          val merged = new Array[Long](set.size)
          val it = set.iterator(); var i = 0
          while (it.hasNext) { merged(i) = it.next(); i += 1 }
          state.update(merged)
          merged.iterator.map(src -> _)
      }
      .toDF("source", "h")
  }

  /** Quota admission on an event stream: at most `cap` events admitted per
    * (event_type, event-hour) key, in (ts, event_id) order — the
    * rate-limiting / per-source-budget shape every ingest pipeline needs
    * ("take at most N crawl records per host per hour"). State is ONE
    * Long per live key (the admitted count so far), carried across
    * micro-batches by flatMapGroupsWithState; admitted rows keep their
    * 1-based admission sequence so the batch twin (a row_number window)
    * is value-identical, not just count-identical.
    *
    * Timestamps travel as epoch micros inside the state machine (a
    * java.sql.Timestamp key would split its µs across getTime/getNanos)
    * and are rebuilt with timestamp_micros on the way out. Within a
    * micro-batch rows are sorted per key before admission; across
    * batches arrival order rules (the streaming contract) — with the
    * bounded AvailableNow source the two coincide, which is what lets
    * the window-function oracle gate the stateful path exactly.
    */
  def quotaAdmit(cap: Int, idleTimeout: String = "4 hours")
                (events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // State is keyed by (source, HOUR) — a key universe that grows with
    // wall-clock time, so unbounded retention would leak one counter per
    // key forever. Bounded via a PROCESSING-TIME idle timeout, NOT an
    // event-time one: an event-time timeout requires a watermark on the
    // input, and the watermark FILTERS late rows out of the stateful
    // operator entirely — a >delay-late arrival would be silently
    // dropped instead of rate-limited, breaking both the operator's
    // contract and the batch-twin equality. An hour's counter goes idle
    // naturally once its hour stops arriving and is shed `idleTimeout`
    // of wall time later. Trade-off of bounded state: `idleTimeout` must
    // exceed the longest expected ingest pause, or a mid-hour quiet
    // spell resets that hour's counter.
    events
      .select(col("event_id").cast("long"), col("event_type"),
        unix_micros(col("ts")),
        unix_micros(date_trunc("hour", col("ts"))))
      .as[(Long, String, Long, Long)]
      .groupByKey { case (_, et, _, h) => (et, h) }
      .flatMapGroupsWithState[Long, (Long, String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case ((et, hourUs), rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val admitted = state.getOption.getOrElse(0L)
            val k = ((cap - admitted) max 0L).toInt
            // Bounded selection: keep only the k earliest (ts, id) pairs in
            // a max-heap of size ≤ k instead of buffering and sorting the
            // whole group — a hot key in one micro-batch costs O(k) memory,
            // never O(group), honoring the bounded-state framing.
            val ord = Ordering.Tuple2[Long, Long]
            val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)
            if (k > 0) rows.foreach { case (id, _, tsUs, _) =>
              if (heap.size < k) heap.enqueue((tsUs, id))
              else if (ord.lt((tsUs, id), heap.head)) {
                heap.dequeue(); heap.enqueue((tsUs, id))
              }
            }
            val taken = heap.dequeueAll.reverse // ascending (ts, id)
            state.update(admitted + taken.size)
            state.setTimeoutDuration(idleTimeout)
            taken.iterator.zipWithIndex.map { case ((_, id), i) =>
              (id, et, hourUs, admitted + i + 1)
            }
          }
      }
      .toDF("event_id", "event_type", "hour_us", "admit_seq")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("hour_us")).as("hour_ts"), col("admit_seq"))
  }

  /** Batch twin of [[quotaAdmit]]: the same admission set and sequence via
    * a plain ranking window — what the quota IS, declaratively.
    */
  def quotaAdmitBatch(cap: Int)(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("event_id").cast("long"), col("event_type"),
        date_trunc("hour", col("ts")).as("hour_ts"),
        row_number().over(w).cast("long").as("admit_seq"))
      .filter(col("admit_seq") <= cap)
  }

  /** Late-arrival audit: per source (event_type), track the maximum
    * event-time seen so far in ARRIVAL order (event_id is the ingest
    * sequence) and flag every arrival whose event time lags that running
    * max by more than `toleranceSec` — the out-of-orderness signal that
    * sizes watermarks, feeds ingest health dashboards, and decides when
    * a source's data is safe to seal into training shards. State is ONE
    * Long per live source (the max event-time in µs), carried by
    * flatMapGroupsWithState; `lag_us` reports how far behind the running
    * max a late row arrived (0 when on time), so downstream can pick the
    * watermark delay as a quantile of observed lag rather than a guess.
    *
    * Within a micro-batch rows are processed per key in event_id
    * (arrival) order; across batches arrival order rules — with the
    * bounded AvailableNow source the two coincide, which is what lets
    * the running-max window twin gate the stateful path exactly.
    *
    * State retention: keys are SOURCES (event types / hosts a pipeline
    * actively ingests) — a bounded, slowly-changing universe, so no
    * timeout is set. Deliberately NOT an event-time timeout: a watermark
    * on the input would drop exactly the late rows this operator exists
    * to measure. For an unbounded source universe, expire idle keys with
    * a processing-time timeout instead.
    */
  def lateAudit(toleranceSec: Long)(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val tolUs = toleranceSec * 1000000L
    events.select(col("event_id").cast("long"), col("event_type"),
        unix_micros(col("ts")))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, String, Boolean, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (et, rows, state: GroupState[Long]) =>
          var maxUs = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(_._1).map { case (id, _, tsUs) =>
            val late = maxUs != Long.MinValue && tsUs < maxUs - tolUs
            val lag = if (late) maxUs - tsUs else 0L
            if (tsUs > maxUs) maxUs = tsUs
            (id, et, late, lag)
          }
          state.update(maxUs)
          out.iterator
      }
      .toDF("event_id", "event_type", "is_late", "lag_us")
  }

  /** Batch twin of [[lateAudit]]: the running max is a plain window over
    * arrival order — what the audit IS, declaratively.
    */
  def lateAuditBatch(toleranceSec: Long)(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tolUs = toleranceSec * 1000000L
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(col("event_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prevmax", max(col("ts_us")).over(w))
      .select(col("event_id"), col("event_type"),
        coalesce(col("prevmax").isNotNull &&
          col("ts_us") < col("prevmax") - tolUs, lit(false)).as("is_late"),
        when(col("prevmax").isNotNull &&
          col("ts_us") < col("prevmax") - tolUs, col("prevmax") - col("ts_us"))
          .otherwise(lit(0L)).as("lag_us"))
  }

  /** Online quality gating of a DOCUMENT stream — the live-crawl-ingest
    * shape: per-row language ID + quality scoring (pure codegen'd
    * expressions, no state, no watermark) with a threshold filter. One
    * definition serves batch and streaming; the batch twin is the oracle.
    */
  def qualityFilter(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.ops.TextOps.langId(col("text")).as("lang_id"),
      round(graft.ops.TextOps.qualityScore(col("text")), 4).as("quality"))
      .filter(col("quality") >= 0.4)

  /** Scrub-on-ingest for a document stream: plant deterministic PII (the
    * testdata is PII-free; the augmentation is the p28 contract, derived
    * from doc_id so batch and stream agree), count + redact it, then
    * NFC-canonicalize the scrubbed text (decomposed first so the
    * normalization does real work). Stateless per-row expressions
    * end-to-end — including the custom NfcNormalize codegen Expression
    * running INSIDE a streaming micro-batch plan. One definition serves
    * batch and streaming; the batch twin is the oracle.
    */
  def scrubStage(spark: SparkSession)(docs: DataFrame): DataFrame = {
    graft.functions.NfcNormalize.register(spark)
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
      lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
      lit("."), (col("doc_id") % 100).cast("string"),
      lit(" call +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val scrubbed = regexp_replace(graft.ops.TextOps.redactPii(aug), "e", "e\u0301")
    docs.select(col("doc_id"), col("source"),
      (graft.ops.TextOps.emailCount(aug) + graft.ops.TextOps.ipv4Count(aug) +
        graft.ops.TextOps.phoneCount(aug)).as("n_pii"),
      md5(call_function("nfc_normalize", scrubbed)).as("scrub_digest"))
  }

  /** Chunk-on-ingest for a document stream: overlapping sliding-window
    * chunking (TextOps.slidingChunks — the RAG/long-context unit) as a
    * stateless streaming stage. Each arriving document explodes into its
    * token windows inside the micro-batch plan: no state store, no
    * watermark, so ingest throughput is scan throughput. One definition
    * serves batch and streaming; the batch twin is the oracle.
    */
  def chunkStage(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        explode(graft.ops.TextOps.slidingChunks(col("text"), 32, 24)).as("c"))
      .select(col("doc_id"), col("source"), col("c.chunk_idx"), col("c.n_tok"),
        md5(col("c.chunk")).as("chunk_md5"))

  /** Score-on-ingest with an offline-trained model — the
    * train-offline/apply-online split every production quality filter uses:
    * the char-trigram LM (TextOps.charLmModel) is fit ONCE on the static
    * corpus, and each arriving document scores against it via a BROADCAST
    * join inside the micro-batch plan (trigram explode and model join are
    * stateless; only the final per-doc aggregation keeps state). One
    * definition serves batch and streaming; the batch twin is the oracle.
    */
  /** IVF-route-on-ingest: the streaming half of vector-index maintenance.
    * Cells are trained OFFLINE on the standing corpus
    * ([[graft.ops.Similarity.ivfCentroids]]); each arriving embedding is
    * assigned to its nearest cell by the native `NearestCells` kernel —
    * the centroid matrix rides in the expression as one literal, so the
    * stage is stateless per-row work with no join, no state store, and
    * ingest runs at scan throughput. This is how a production vector
    * index absorbs new vectors between retrains: route on ingest, retrain
    * cells on a slow cadence.
    */
  def ivfRouteStage(cents: Array[Array[Double]])(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      graft.ops.Similarity.nearestCell(col("embedding"), cents)
        .cast("long").as("cell"))

  def charLmStage(model: DataFrame)(docs: DataFrame): DataFrame =
    graft.ops.TextOps.charLmScoreWith(model, docs, "doc_id", "text")

  /** Fuzzy-watchlist scoring on ingest: each arriving document's normalized
    * key scores against a SMALL known watchlist by jaro_winkler similarity.
    * The watchlist COMPILES INTO the row expression (greatest of per-key
    * calls on the codegen'd TextSim expression) — no join, no state, no
    * shuffle; ingest throughput is scan throughput. Large watchlists take
    * the blocking-join shape instead (q39_fuzzy_keys). Per-key scores round
    * to 6 dp BEFORE the max/avg rollup — the cross-engine float contract.
    */
  def fuzzyWatchStage(spark: SparkSession, watch: Seq[String])
                     (docs: DataFrame): DataFrame = {
    graft.functions.DuckCompat.register(spark)
    val jwCalls = watch.map(w =>
      s"round(jaro_winkler_similarity(k, '${w.replace("'", "''")}'), 6)")
    val best =
      if (jwCalls.isEmpty) "CAST(0.0 AS DOUBLE)"
      else if (jwCalls.length == 1) jwCalls.head
      else s"greatest(${jwCalls.mkString(", ")})"
    docs
      .select(col("doc_id"), col("source"),
        expr("substr(lower(regexp_replace(text, '[^a-zA-Z ]', '')), 1, 12)").as("k"))
      .filter(length(col("k")) >= 1)
      .withColumn("best_jw", expr(best))
      .withColumn("flagged", col("best_jw") >= 0.85)
  }

  /** Row-count gate for broadcasting the corpus band index into the
    * micro-batch plan: ~5M (partner, band, bucket) rows is a few hundred
    * MB broadcast — past it, shipping the index to every task each trigger
    * costs more than shuffling the (small) batch to the index. The same
    * bounded-input-vs-shuffle trade as [[graft.graph.Tiled]]'s
    * BroadcastPairLimit snap gate. SURVEY §9.3 is the design note.
    */
  final val BroadcastIndexLimit = 5000000L

  /** Near-dup-on-ingest — the streaming half of the MinHash/LSH dedup
    * family: each arriving document computes its LSH band buckets as ONE
    * per-row expression (Dedup.bandBucketArray — no explode/groupBy, no
    * state store) and probes a STATIC corpus band index via a
    * stream-static join. Matches land in the sink as (doc_id, partner,
    * band); the per-doc rollup happens batch-side so the stream stage
    * itself stays stateless — ingest throughput is signature throughput.
    *
    * Index-size gate (VERDICT r4 #8): while the index fits
    * `broadcastLimit` rows it broadcasts — re-shipped per trigger only
    * when it changes. Past the gate (a corpus whose band index outgrows
    * executor broadcast memory) the join runs WITHOUT the broadcast hint,
    * so the static side shuffles on (band, bucket) and each micro-batch
    * co-partitions with it — at deployment scale the index is a persisted
    * table bucketed by (band, bucket) (the p50 bucketed-layout machinery),
    * which removes even that static-side exchange; the stream side's
    * per-batch shuffle is proportional to the BATCH, never the corpus.
    * The gate runs ONCE at stage construction against the persisted index
    * frame (a deployment reads the count from table metadata), never per
    * micro-batch.
    *
    * Persist lifecycle: the index frame is cached (MEMORY_AND_DISK) for
    * the stage's lifetime and not unpersisted here — the stream that
    * reads it is lazy and long-lived. Sessions that rebuild the stage per
    * index refresh should `spark.catalog.clearCache()` (or unpersist the
    * previous index) between generations, as the Bench/Verify harnesses
    * do, or retired index caches accumulate.
    */
  def nearDupStage(corpusBands: DataFrame,
                   broadcastLimit: Long = BroadcastIndexLimit)
                  (docs: DataFrame): DataFrame = {
    val idx = corpusBands.select(col("doc").as("partner"),
        col("band"), col("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fits = idx.count() <= broadcastLimit
    val probes = docs.select(col("doc_id"),
      posexplode(graft.ops.Dedup.bandBucketArray("text", 5, 12, 3))
        .as(Seq("band", "bucket")))
    // past the gate the hint pins the shuffled join: without it the
    // optimizer's auto-broadcast would re-ship a just-under-threshold
    // index every trigger — the exact regime the gate exists to end
    probes.join(if (fits) broadcast(idx) else idx.hint("shuffle_merge"),
        Seq("band", "bucket"))
      .filter(col("partner") =!= col("doc_id"))
      .select(col("doc_id"), col("partner"), col("band"))
  }

  /** Regime 3 of the §9.3 index-size ladder — the deployment-scale shape:
    * the corpus band index is a PERSISTED table bucketed on
    * `(band, bucket)` ([[graft.ops.Dedup.writeBandIndexTable]]), so the
    * static side's shuffle was paid once at write time and the per-trigger
    * join plan carries NO static-side Exchange — the bucketed scan already
    * satisfies the join's required distribution. Only the micro-batch's
    * probe rows shuffle, and that exchange is proportional to the BATCH,
    * never the corpus. The `merge` hint pins the sort-merge shape: without
    * it a small index would auto-broadcast (regime 1's plan — re-shipped
    * per trigger, the cost this regime exists to end) and the bucket
    * layout would buy nothing. Rows are identical across all three
    * regimes (StreamingSpec proves path equality and the no-Exchange
    * plan property).
    */
  def nearDupStageIndexed(spark: SparkSession, indexTable: String)
                         (docs: DataFrame): DataFrame = {
    val idx = spark.table(indexTable)
    val probes = docs.select(col("doc_id"),
      posexplode(graft.ops.Dedup.bandBucketArray("text", 5, 12, 3))
        .as(Seq("band", "bucket")))
    probes.join(idx.hint("merge"), Seq("band", "bucket"))
      .filter(col("partner") =!= col("doc_id"))
      .select(col("doc_id"), col("partner"), col("band"))
  }

  /** Row shape of [[mediaFeatureStage]] (top-level-in-object so the
    * implicit product Encoder resolves inside the streaming plan).
    */
  final case class MediaFeat(doc_id: Long, kind: String, n_bytes: Long,
                             f1: Float, f4: Float)

  /** Featurize-on-ingest for a MEDIA stream — the multimodal half of the
    * live-crawl shape (s06 gates text quality; this stage decodes bytes):
    * each arriving document's media blob runs the REAL decode dispatch
    * (ImageIO pixels / native FLAC / native AVI container walk) inside the
    * micro-batch plan. The blob itself is the deterministic per-id fixture
    * (PNG / FLAC / uncompressed AVI by doc_id % 3 — the fixture-generator
    * role a real crawl's bytes column would fill), synthesized and decoded
    * in ONE typed mapPartitions so the bytes never ship twice. Stateless:
    * no state store, no watermark — ingest throughput IS decode
    * throughput, and the upstream `spread` repartition fans the
    * CPU-heavy decode across cores exactly like the batch p39/p72/p74
    * fixture pattern. Emits (doc_id, kind, n_bytes, f1, f4) where f1/f4
    * are decode features 0 and 3 (mean-R/luma for pixels, RMS/peak for
    * audio). One definition serves batch and streaming; the batch twin
    * plus the per-seed mirror literals are the oracle.
    */
  def mediaFeatureStage(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.ops.Spread.cpu(docs.select(col("doc_id").cast("long"))).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val (kind, bytes) = (id % 3) match {
          case 0 => ("image", graft.ops.Multimodal.syntheticPng(id % 300))
          case 1 => ("flac", graft.ops.Multimodal.syntheticFlac(id))
          case _ => ("video", graft.ops.Multimodal.syntheticAvi(id))
        }
        val f = graft.ops.Multimodal.decode(bytes)
        MediaFeat(id, kind, bytes.length.toLong, f(0), f(3))
      }
    }.toDF()
  }

  final case class WarcOut(doc_id: Long, url: String, status: Int,
                           n_bytes: Long, text: String)

  /** Streaming WARC ingest — the first mile of a LIVE crawl: each arriving
    * element is one fetched `.warc.gz` archive (warcinfo + response
    * members, record-at-time gzip), pushed through the REAL ingest path —
    * RFC 1952 member split with CRC verification → ISO 28500 header parse
    * → type filter → HTTP envelope strip — inside the micro-batch plan.
    * Stateless per-row (no state store, no watermark), so the trigger
    * carries pure decode CPU exactly like [[mediaFeatureStage]]; the
    * archive fixture is built from the row itself, which makes the stage a
    * self-contained round-trip witness: the emitted body must be
    * byte-identical to the document text that went in.
    */
  final case class ArcOut(doc_id: Long, url: String, ip: String,
                          arc_date: String, status: Int, n_bytes: Long,
                          text: String)

  /** The s48 stage: every arriving element is one fetched .arc.gz
    * (version block + one response record), decoded by the REAL
    * gzip-member/ARC/HTTP path inside the micro-batch plan — the
    * pre-WARC twin of [[warcIngestStage]]. Stateless.
    */
  def arcIngestStage(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)].mapPartitions { it =>
        it.flatMap { case (id, source, text) =>
          val body = text.getBytes(UTF_8)
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
            s"charset=utf-8\r\nContent-Length: ${body.length}\r\n\r\n")
            .getBytes(UTF_8) ++ body
          val date = (20120101000000L + id).toString
          val ver = graft.ops.Ingest.writeArcVersionBlock(s"seg-$id.arc", date)
          val rec = graft.ops.Ingest.writeArcRecord(graft.ops.Ingest.ArcRecord(
            s"https://example.com/$source/$id", s"203.0.113.${id % 251}",
            date, "text/html", http))
          val archive = graft.ops.Ingest.gzipConcat(Seq(ver, rec))
          graft.ops.Ingest.gzipMembers(archive).iterator.drop(1)
            .flatMap(graft.ops.Ingest.parseArcRecord)
            .flatMap { r =>
              graft.ops.Ingest.stripHttpEnvelope(r.payload).map { case (st, b) =>
                ArcOut(id, r.url, r.ip, r.date, st, b.length.toLong,
                  new String(b, UTF_8))
              }
            }
        }
      }.toDF()
  }

  def warcIngestStage(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)].mapPartitions { it =>
        it.flatMap { case (id, source, text) =>
          val body = text.getBytes(UTF_8)
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
            s"charset=utf-8\r\nContent-Length: ${body.length}\r\n\r\n")
            .getBytes(UTF_8) ++ body
          val info = graft.ops.Ingest.writeWarcRecord(graft.ops.Ingest.WarcRecord(
            "warcinfo", None, Some(s"<urn:uuid:info-$id>"),
            Some("application/warc-fields"), "software: graft-stream\r\n".getBytes(UTF_8)))
          val rec = graft.ops.Ingest.writeWarcRecord(graft.ops.Ingest.WarcRecord(
            "response", Some(s"https://example.com/$source/$id"),
            Some(s"<urn:uuid:rec-$id>"),
            Some("application/http; msgtype=response"), http))
          val archive = graft.ops.Ingest.gzipConcat(Seq(info, rec))
          graft.ops.Ingest.gzipMembers(archive).iterator
            .flatMap(graft.ops.Ingest.parseWarcRecord)
            .filter(_.warcType == "response")
            .flatMap { r =>
              graft.ops.Ingest.stripHttpEnvelope(r.payload).map { case (st, b) =>
                WarcOut(id, r.targetUri.orNull, st, b.length.toLong,
                  new String(b, UTF_8))
              }
            }
        }
      }.toDF()
  }

  /** The live-crawl first mile COMPLETE, as one stateless micro-batch
    * stage: archive → gzip member → WARC record → HTTP envelope →
    * charset-aware decode → HTML main-content extraction. Like
    * [[warcIngestStage]] the archive is built from the row itself
    * (adversarial [[graft.ops.Html.wrapFixture]] markup), so the stage is
    * a self-contained round-trip witness: the extracted text must equal
    * the whitespace-normalized document that went in, paragraph-chunked —
    * the p86 contract, now proven under the streaming engine. Extraction
    * is the codegen'd `html_text` expression riding the micro-batch plan;
    * no state store, no watermark.
    */
  def htmlIngestStage(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    val pages = docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)].mapPartitions { it =>
        it.flatMap { case (id, source, text) =>
          val html = graft.ops.Html.wrapFixture(id, source, text)
          // the decode mix, live: a third of the archives arrive as BOM'd
          // UTF-16 (LE and BE) with NO charset declaration — bytes a UTF-8-
          // assuming decoder turns to NUL-riddled garbage, so the unchanged
          // batch oracle only holds if the streaming stage runs the real
          // BOM sniff. The decoded text is identical by construction.
          val (body, ctHeader) = (id % 3) match {
            case 1 => (Array(0xff.toByte, 0xfe.toByte) ++
              html.getBytes(java.nio.charset.StandardCharsets.UTF_16LE),
              "text/html")
            case 2 => (Array(0xfe.toByte, 0xff.toByte) ++
              html.getBytes(java.nio.charset.StandardCharsets.UTF_16BE),
              "text/html")
            case _ => (html.getBytes(UTF_8), "text/html; charset=utf-8")
          }
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctHeader\r\n" +
            s"Content-Length: ${body.length}\r\n\r\n")
            .getBytes(UTF_8) ++ body
          val rec = graft.ops.Ingest.writeWarcRecord(graft.ops.Ingest.WarcRecord(
            "response", Some(s"https://example.com/$source/$id"),
            Some(s"<urn:uuid:rec-$id>"),
            Some("application/http; msgtype=response"), http))
          graft.ops.Ingest.gzipMembers(graft.ops.Ingest.gzipConcat(Seq(rec)))
            .iterator
            .flatMap(graft.ops.Ingest.parseWarcRecord)
            .filter(_.warcType == "response")
            .flatMap { r =>
              graft.ops.Ingest.parseHttpResponse(r.payload).map {
                case (_, ct, b) => (id, graft.ops.Ingest.decodeHttpBody(b, ct)._1)
              }
            }
        }
      }.toDF("doc_id", "html")
    pages
      .select(col("doc_id"), graft.functions.HtmlText(spark, col("html")).as("h"))
      .select(col("doc_id"), col("h.title").as("title"),
        col("h.text").as("text"),
        col("h.n_kept").as("n_kept"), col("h.n_dropped").as("n_dropped"))
  }

  /** Stream-static enrichment — the standard streaming-ingest shape: each
    * arriving event picks up its dimension row via a BROADCAST join (the
    * static side is planned once and shipped to executors; no state store,
    * no watermark needed for the join itself), then rolls up per segment.
    * One definition serves batch and streaming inputs.
    */
  def enrichBySegment(dim: DataFrame)(events: DataFrame): DataFrame =
    events
      .join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))

  /** [[runBounded]] over the `documents` table (no event-time column). */
  def runBoundedDocs(spark: SparkSession, dir: String, name: String,
                     transform: DataFrame => DataFrame,
                     outputMode: String = "append",
                     shufflePartitions: Option[Int] = None,
                     spread: Boolean = true,
                     fileSink: Boolean = false): DataFrame =
    runBoundedTable(spark, dir, "documents", name, transform, outputMode,
      shufflePartitions, spread, fileSink)

  def runBoundedTable(spark: SparkSession, dir: String, table: String,
                      name: String, transform: DataFrame => DataFrame,
                      outputMode: String = "append",
                      shufflePartitions: Option[Int] = None,
                      spread: Boolean = true,
                      fileSink: Boolean = false): DataFrame = {
    val staticDf = spark.read.parquet(s"$dir/$table.parquet")
    val stream = spark.readStream
      .schema(staticDf.schema)
      .parquet(s"$dir/$table.parque[t]")
    // FileStreamSource parallelism is file-granular: a single small
    // parquet fixture becomes ONE task, serializing the per-row stage
    // work (measured: s08 addBatch ~860 ms single-threaded). Spread the
    // micro-batch across cores before a CPU-heavy transform; stages whose
    // per-row work is cheaper than an exchange pass spread=false. At
    // production scale (many files per trigger) the source parallelizes
    // naturally and this exchange is per-batch noise.
    val src =
      if (spread) stream.repartition(
        shufflePartitions.getOrElse(spark.sparkContext.defaultParallelism))
      else stream
    runStream(spark, name, transform(src), outputMode, shufflePartitions, fileSink)
  }

  /** Run `transform` over `<dir>/events.parquet` as a bounded stream
    * (Trigger.AvailableNow, complete mode) into a memory sink; returns the
    * sink contents. This is the bridge that lets the driver's batch oracle
    * gate the streaming engine.
    */
  def runBounded(spark: SparkSession, dir: String, name: String,
                 transform: DataFrame => DataFrame,
                 outputMode: String = "complete",
                 shufflePartitions: Option[Int] = None,
                 noDataBatches: Boolean = true): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val staticDf = spark.read.parquet(s"$dir/events.parquet")
    // FileStreamSource requires a directory or glob basePath — glob the
    // single file rather than pointing at it directly.
    val stream = spark.readStream
      .schema(staticDf.schema)
      .parquet(s"$dir/events.parque[t]")
      .withColumn("ts", graft.queries.Tables.normalizedTs(staticDf))
    runStream(spark, name, transform(stream), outputMode, shufflePartitions,
      noDataBatches = noDataBatches)
  }

  private def runStream(spark: SparkSession, name: String, transformed: DataFrame,
                        outputMode: String,
                        shufflePartitions: Option[Int],
                        fileSink: Boolean = false,
                        noDataBatches: Boolean = true): DataFrame = {
    // fail fast on the flag conflict rather than from Spark internals at
    // start(): the parquet streaming sink supports only append
    require(!fileSink || outputMode == "append",
      s"fileSink=true requires outputMode 'append' (the parquet streaming " +
        s"sink supports no other mode); got outputMode='$outputMode'")
    // a stateful query instantiates one state store PER shuffle partition
    // PER stateful operator; heavily-stateful shapes (stream-stream joins
    // run four stores per partition) want fewer, larger partitions at
    // test scale — the conf is fixed at query start, so restore after
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    shufflePartitions.foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
    // No-data micro-batches exist to fire event-time/processing-time
    // timers eagerly. Under Trigger.AvailableNow a PENDING processing-
    // time timer (e.g. quotaAdmit's idle TTL, hours long by design)
    // keeps the engine scheduling empty batches until the timer fires —
    // the bounded run never terminates. Stages that register such
    // timers pass noDataBatches=false: timers then fire lazily on later
    // data-driven triggers, which is their production semantics anyway.
    // Left ON for everything else — watermarked append-mode windows
    // need the final no-data batch to flush their last windows.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noDataKey, "true")
    if (!noDataBatches) spark.conf.set(noDataKey, "false")
    try {
      // Bounded verification runs pair a MEMORY sink with an ephemeral
      // checkpoint, so checkpoint durability buys nothing — put it on
      // tmpfs when available to keep offset/commit-log fsyncs off the
      // disk. Real deployments override with a durable checkpointLocation.
      val ckBase = {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isWritable(shm)) shm
        else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
      }
      val ck = java.nio.file.Files.createTempDirectory(ckBase, s"graft-ck-$name")
      // High-fanout per-row stages (s12's match stream) take a FILE sink —
      // the memory sink funnels every task's output through
      // spark.driver.maxResultSize, which a 10x corpus blows (measured:
      // 1.04 GiB of matches vs the 1 GiB cap). A parquet sink is also the
      // production shape: executors write partitions directly. The result
      // reads back and is localCheckpoint'd so the temp dir can be
      // deleted before returning.
      val outDir =
        if (fileSink)
          Some(java.nio.file.Files.createTempDirectory(s"graft-sink-$name"))
        else None
      val writer0 = transformed.writeStream
        .option("checkpointLocation", ck.toString)
        .outputMode(outputMode)
        .trigger(Trigger.AvailableNow())
      val q = outDir match {
        case Some(dir) =>
          writer0.format("parquet").option("path", dir.toString).start()
        case None =>
          writer0.format("memory").queryName(name).start()
      }
      q.awaitTermination()
      if (sys.env.contains("GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach(p => System.err.println(
          s"[stream-debug] $name batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}"))
      outDir match {
        case Some(dir) =>
          try spark.read.schema(transformed.schema).parquet(dir.toString)
            .localCheckpoint(true)
          finally graft.ops.Fs.deleteRecursively(dir)
        case None => spark.table(name)
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set(noDataKey, prevNoData)
    }
  }
}
