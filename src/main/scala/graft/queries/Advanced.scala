package graft.queries

import graft.ops.Multimodal
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming + multimodal surface.
  *
  * Streaming queries run the SAME transforms as their batch twins over a
  * bounded file stream (Trigger.AvailableNow → memory sink), so the DuckDB
  * oracle that validates the batch path validates the streaming engine too.
  * Multimodal queries exercise the opaque-binary `mapPartitions` plumbing
  * (deterministic stub decode — no media codecs in this container) and are
  * rows-only checks.
  */
object Advanced {
  import Tables.t

  def defs: Seq[QueryDef] = Seq(

    QueryDef("s01_stream_hourly",
      (s, d) => EventStreams.runBounded(s, d, "s01_sink", EventStreams.hourlyAgg,
          shufflePartitions = Some(8))
        .orderBy(col("hour_ts"), col("event_type")),
      Some("""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             |count(*) AS n, round(sum(value), 4) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin)),

    QueryDef("s02_stream_sessions",
      (s, d) => EventStreams.runBounded(s, d, "s02_sink", EventStreams.sessionAgg,
          shufflePartitions = Some(8))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH marked AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, min(ts) AS session_start,
             |  count(*) AS n_events, round(sum(value), 4) AS session_value
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    QueryDef("s03_stream_dedup",
      (s, d) => EventStreams.runBounded(s, d, "s03_sink", EventStreams.dedup,
          outputMode = "append", shufflePartitions = Some(8))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT event_id) AS n_unique
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef("s04_stream_custom_state",
      (s, d) => {
        // flatMapGroupsWithState running totals; the FINAL emitted state per
        // user (max n_events row) must equal the batch group-by — exact
        // oracle regardless of micro-batch splits
        val sink = EventStreams.runBounded(s, d, "s04_sink",
          EventStreams.runningUserTotals, outputMode = "append",
          shufflePartitions = Some(8))
        sink.groupBy(col("user_id"))
          .agg(max(struct(col("n_events"), col("total_value"))).as("fin"))
          .select(col("user_id"), col("fin.n_events").as("n_events"),
            col("fin.total_value").as("total_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |round(sum(value), 4) AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    QueryDef("s06_stream_quality",
      (s, d) => {
        // stateless online quality gate over a DOCUMENT stream (live-crawl
        // ingest): per-row langid + quality scoring with threshold filter;
        // batch-side rollup of the append sink vs exact batch oracle
        EventStreams.runBoundedDocs(s, d, "s06_sink", EventStreams.qualityFilter,
            shufflePartitions = Some(8))
          .groupBy(col("lang_id"))
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("quality")), 4).as("avg_quality"))
          .orderBy(col("lang_id"))
      },
      Some {
        def hits(words: Seq[String]) = {
          val arr = words.mkString("['", "', '", "']")
          s"len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0), t -> list_contains($arr, t)))"
        }
        val en = hits(graft.ops.TextOps.StopwordsEn)
        val de = hits(graft.ops.TextOps.StopwordsDe)
        val es = hits(graft.ops.TextOps.StopwordsEs)
        val fr = hits(graft.ops.TextOps.StopwordsFr)
        s"""WITH scored AS (
           |  SELECT doc_id,
           |    $en AS hits_en, $de AS hits_de, $es AS hits_es, $fr AS hits_fr,
           |    len(list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS n_words,
           |    CASE WHEN length(text) > 0
           |      THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
           |      ELSE 0.0 END AS punct_ratio,
           |    length(text) AS n_chars
           |  FROM documents),
           |q AS (
           |  SELECT doc_id,
           |    CASE WHEN greatest(hits_en, hits_de, hits_es, hits_fr) = 0 THEN 'und'
           |      WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
           |      WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
           |      WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
           |      ELSE 'fr' END AS lang_id,
           |    round(least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
           |      + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3
           |      + least((CASE WHEN n_words > 0 THEN CAST(hits_en AS DOUBLE) / n_words ELSE 0.0 END) * 4.0, 1.0) * 0.3,
           |      4) AS quality
           |  FROM scored)
           |SELECT lang_id, CAST(count(*) AS BIGINT) AS n_docs,
           |  round(avg(quality), 4) AS avg_quality
           |FROM q WHERE quality >= 0.4
           |GROUP BY lang_id ORDER BY lang_id""".stripMargin
      }),

    QueryDef("s08_stream_scrub",
      (s, d) => {
        // scrub-on-ingest: PII count/redact + NFC canonicalization as a
        // stateless document-stream stage (the custom NfcNormalize codegen
        // Expression inside a micro-batch plan); per-source rollup of the
        // append sink vs the identical batch transform in DuckDB
        EventStreams.runBoundedDocs(s, d, "s08_sink", EventStreams.scrubStage(s),
            shufflePartitions = Some(8))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_pii")).as("n_pii"),
            min(col("scrub_digest")).as("min_digest"),
            max(col("scrub_digest")).as("max_digest"))
          .orderBy(col("source"))
      },
      Some {
        import graft.ops.TextOps
        s"""WITH aug AS (
           |  SELECT doc_id, source,
           |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
           |         || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
           |         || '.' || CAST(doc_id % 100 AS VARCHAR)
           |         || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS a
           |  FROM documents),
           |scrub AS (
           |  SELECT doc_id, source,
           |    len(regexp_extract_all(a, '${TextOps.EmailRe}'))
           |      + len(regexp_extract_all(a, '${TextOps.Ipv4Re}'))
           |      + len(regexp_extract_all(a, '${TextOps.PhoneRe}')) AS n_pii,
           |    md5(nfc_normalize(regexp_replace(
           |      regexp_replace(regexp_replace(regexp_replace(a,
           |        '${TextOps.EmailRe}', '[EMAIL]', 'g'),
           |        '${TextOps.Ipv4Re}', '[IP]', 'g'),
           |        '${TextOps.PhoneRe}', '[PHONE]', 'g'),
           |      'e', 'e' || chr(769), 'g'))) AS scrub_digest
           |  FROM aug)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_pii) AS BIGINT) AS n_pii,
           |  min(scrub_digest) AS min_digest, max(scrub_digest) AS max_digest
           |FROM scrub GROUP BY source ORDER BY source""".stripMargin
      }),

    QueryDef("s07_stream_enrich",
      (s, d) => {
        // stream-static enrichment: events stream joins the broadcast
        // customer dimension — the canonical streaming-ingest join (no
        // state store; the static side plans once per micro-batch)
        val dim = t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
        EventStreams.runBounded(s, d, "s07_sink", EventStreams.enrichBySegment(dim),
            shufflePartitions = Some(8))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n, round(sum(value), 4) AS total_value
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    QueryDef("s05_stream_join",
      (s, d) => EventStreams.runBounded(s, d, "s05_sink", EventStreams.intervalJoin,
          outputMode = "append", shufflePartitions = Some(8))
        .groupBy(col("p_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id")),
      Some("""SELECT p.user_id, count(*) AS n_pairs
             |FROM events p JOIN events v ON v.user_id = p.user_id
             |  AND p.event_type = 'purchase' AND v.event_type = 'view'
             |  AND v.ts >= p.ts - INTERVAL 10 MINUTE AND v.ts <= p.ts
             |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin)),

    QueryDef("p11_multimodal_features",
      (s, d) => {
        import s.implicits._
        // REAL image decode: deterministic synthetic PNG per document
        // (fixture generator, like OsmPbfWriter for PBF) → ImageIO pixels
        // → pooled features. No oracle possible (DuckDB has no image
        // decoder); exact goldens live in MultimodalSpec.
        val ids = t(s, d, "documents").select($"doc_id")
        val imgs = Multimodal.synthesizeImages(ids, "doc_id")
        Multimodal.extractFeatures(imgs, "id", "media", "image/png")
          .select($"id", $"format", $"n_bytes",
            round(element_at($"features", 1), 4).as("mean_r"),
            round(element_at($"features", 4), 4).as("mean_luma"),
            round(element_at($"features", 5), 4).as("q0_luma"))
          .orderBy($"id")
      }, None),

    QueryDef("p38_image_neardup",
      (s, d) => {
        import s.implicits._
        // image dedup across the media column: seeds repeat mod 300, so
        // every doc_id >= 300 carries an exact pixel duplicate of
        // doc_id - 300 — the perceptual-hash pipeline must find all of
        // them at Hamming 0 via the banded bucket join (no all-pairs).
        // No oracle possible (decode-dependent); exactness goldens live
        // in MultimodalSpec, and the planted-duplicate recall is asserted
        // right here: missing pairs make the driver row count drop.
        val ids = t(s, d, "documents").select($"doc_id", ($"doc_id" % 300).as("seed"))
        val media = {
          import org.apache.spark.sql.Row
          import org.apache.spark.sql.types._
          val schema = StructType(Seq(
            StructField("doc_id", LongType), StructField("media", BinaryType)))
          s.createDataFrame(
            ids.select($"doc_id".cast("long"), $"seed".cast("long")).rdd
              .mapPartitions { it =>
                javax.imageio.ImageIO.setUseCache(false)
                it.map(r => Row(r.getLong(0), Multimodal.syntheticPng(r.getLong(1))))
              }, schema)
        }
        Multimodal.imageNearDupPairs(media, "doc_id", "media", maxHamming = 4)
          .orderBy($"a", $"b")
      }, None),

    QueryDef("p39_audio_features",
      (s, d) => {
        import s.implicits._
        // REAL audio decode: seed-keyed sine WAV per document → javax.sound
        // PCM samples → RMS/ZCR/peak + temporal pooling. Same mapPartitions
        // batch shape as image features; no oracle possible (DuckDB has no
        // audio codec) — exact signal-theory goldens live in MultimodalSpec.
        val ids = t(s, d, "documents").select($"doc_id")
        val media = {
          import org.apache.spark.sql.Row
          import org.apache.spark.sql.types._
          val schema = StructType(Seq(
            StructField("doc_id", LongType), StructField("media", BinaryType)))
          s.createDataFrame(
            ids.select($"doc_id".cast("long")).rdd.mapPartitions { it =>
              it.map(r => Row(r.getLong(0), Multimodal.syntheticWav(r.getLong(0))))
            }, schema)
        }
        Multimodal.extractFeatures(media, "doc_id", "media", "audio/wav")
          .select($"id", $"format", $"n_bytes",
            round(element_at($"features", 1), 4).as("rms"),
            round(element_at($"features", 2), 5).as("zcr"),
            round(element_at($"features", 4), 4).as("peak"))
          .orderBy($"id")
      }, None),

    QueryDef("p12_multimodal_frames",
      (s, d) => {
        import s.implicits._
        val blobs = t(s, d, "documents")
          .select($"doc_id", encode($"text", "UTF-8").as("media"))
        Multimodal.sampleFrames(blobs, "doc_id", "media", frameBytes = 32, everyK = 2)
          .groupBy($"id")
          .agg(count(lit(1)).as("n_frames"), sum(length($"frame")).as("total_bytes"))
          .orderBy($"id")
      }, None)
  )
}
