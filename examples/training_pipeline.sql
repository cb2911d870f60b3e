-- Training-data pipeline, SQL-only surface.
-- Session setup: spark.sql.extensions=graft.GraftExtensions registers
-- cosine_sim, nfc_normalize, bloom_filter_agg, might_contain at build time;
-- the graft_* text macros install via queries.Pipeline p22 or
-- `CREATE TEMPORARY FUNCTION` as below. Tables are plain parquet reads:
--   CREATE TEMPORARY VIEW documents USING parquet OPTIONS (path '<dir>/documents.parquet');
--   CREATE TEMPORARY VIEW embeddings USING parquet OPTIONS (path '<dir>/embeddings.parquet');

-- 1. Canonicalize + cheap quality stats (single codegen'd scan).
CREATE OR REPLACE TEMPORARY VIEW canon AS
SELECT doc_id, source, lang,
       nfc_normalize(text) AS text,
       size(filter(split(text, '\\s+'), x -> length(x) > 0)) AS n_words
FROM documents;

-- 2. PII scrub (chained regexp_replace; patterns in graft.ops.TextOps).
CREATE OR REPLACE TEMPORARY VIEW scrubbed AS
SELECT doc_id, source, lang, n_words,
       regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]'),
         '\\b\\d{1,3}(\\.\\d{1,3}){3}\\b', '[IP]'),
         '\\+\\d{1,2}-\\d{3}-\\d{3,}', '[PHONE]') AS text
FROM canon;

-- 3. Exact dedup: keep the lowest doc_id per digest.
CREATE OR REPLACE TEMPORARY VIEW deduped AS
SELECT * FROM (
  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
  FROM scrubbed)
WHERE doc_id = keeper;

-- 4. Blocklist prune without shuffling the corpus: bloom prefilter
--    (scalar subquery -> broadcast), exact residual anti-join on the
--    bloom-positive candidates only.
CREATE OR REPLACE TEMPORARY VIEW blocklist AS
SELECT DISTINCT md5(text) AS digest FROM documents WHERE source = 'src0';

CREATE OR REPLACE TEMPORARY VIEW cleared AS
SELECT d.* FROM deduped d
WHERE NOT might_contain(
        (SELECT bloom_filter_agg(xxhash64(digest), 10000L, 65536L) FROM blocklist),
        xxhash64(md5(d.text)))
UNION ALL
SELECT d.* FROM deduped d
LEFT ANTI JOIN blocklist b ON md5(d.text) = b.digest
WHERE might_contain(
        (SELECT bloom_filter_agg(xxhash64(digest), 10000L, 65536L) FROM blocklist),
        xxhash64(md5(d.text)));

-- 5. Per-source quota: keep each source's 10 longest documents.
CREATE OR REPLACE TEMPORARY VIEW capped AS
SELECT * FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY n_words DESC, doc_id) AS rnk
  FROM cleared)
WHERE rnk <= 10;

-- 5b. Same quota, host-dialect spelling: the injected-parser QUALIFY
--     clause folds to the identical one-window plan (plans.Qualify).
-- SELECT * FROM cleared
-- QUALIFY row_number() OVER (PARTITION BY source
--                            ORDER BY n_words DESC, doc_id) <= 10;

-- 6. Embedding near-dup check over the survivors (native cosine kernel).
SELECT a.doc_id AS a, b.doc_id AS b,
       round(cosine_sim(ea.embedding, eb.embedding), 4) AS sim
FROM capped a JOIN capped b ON a.doc_id < b.doc_id
JOIN embeddings ea ON ea.vec_id = a.doc_id
JOIN embeddings eb ON eb.vec_id = b.doc_id
WHERE cosine_sim(ea.embedding, eb.embedding) > 0.95
ORDER BY sim DESC;

-- 7. Per-source corpus report, BY-ALL shorthand (GROUP BY ALL infers the
--    grouping keys; ORDER BY ALL sorts by the full output row).
SELECT source, lang, count(*) AS n_docs, round(avg(n_words), 2) AS avg_words
FROM capped
GROUP BY ALL
ORDER BY ALL;

-- 8. Host vocabulary runs unchanged (functions.DuckCompat): len /
--    string_split (literal delimiter) / list_* / regexp_matches all
--    resolve to native codegen'd Spark expressions.
SELECT doc_id,
       CAST(len(text) AS INT) AS n_chars,
       CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS INT) AS n_long,
       regexp_matches(text, '[0-9][0-9][0-9]') AS has_num3
FROM documents USING SAMPLE 100 ROWS;

-- 9. Scalar + table macros (host DDL, inlined at parse time).
CREATE OR REPLACE MACRO disc_price(p, d) AS p * (1 - d);
CREATE OR REPLACE MACRO top_docs(k) AS TABLE
    SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT k;
SELECT doc_id, CAST(len(text) AS INT) AS n FROM top_docs(5);

-- 10. Multimodal columns from pure SQL (round 6): media_kind routes a
--     mixed BINARY column to per-modality pipelines, media_features runs
--     the REAL decode dispatch (ImageIO pixels + MJPEG AVI frames,
--     javax.sound PCM, native FLAC, native G.711/ADPCM WAV, native
--     uncompressed/RLE8 AVI) inside whole-stage codegen; anything
--     undecodable reports kind 'stub' and deterministic fallback
--     features, so a 100 TB crawl never aborts on a corrupt blob.
--     Wanting BOTH the label and the features? media_decode runs the
--     dispatch ONCE and returns STRUCT<kind, features> — two separate
--     function calls would decode every blob twice.
--   CREATE TEMPORARY VIEW crawl USING parquet OPTIONS (path '<dir>/crawl.parquet');
-- WITH m AS (SELECT media_decode(media) AS d FROM crawl)
-- SELECT d.kind                                     AS kind,
--        count(*)                                   AS n_blobs,
--        round(avg(element_at(d.features, 4)), 4)   AS mean_luma_or_peak
-- FROM m
-- GROUP BY ALL ORDER BY ALL;

-- 11. Exact quality gates without sorting the corpus (round 6): the
--     value-histogram quantile — shuffle cardinality is |distinct
--     (lang, n_words)|, never the row count, so "p99 tokens per doc"
--     stays exact at 100 TB (ops/Stats.exactQuantiles is the
--     DataFrame-level spelling of the same plan).
SELECT lang, n,
  min(CASE WHEN cum >= ceil(0.5 * n) THEN v END)  AS p50_words,
  min(CASE WHEN cum >= ceil(0.99 * n) THEN v END) AS p99_words
FROM (
  SELECT lang, v, cnt,
    sum(cnt) OVER (PARTITION BY lang ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS cum,
    sum(cnt) OVER (PARTITION BY lang)        AS n
  FROM (SELECT lang, n_words AS v, count(*) AS cnt
        FROM capped GROUP BY 1, 2))
GROUP BY lang, n ORDER BY lang;

-- 12. Table maintenance: size-tiered compaction planning over the file
--     LISTING (round 6; ops/Layout.compactionPlan) — pure windowed
--     arithmetic, so the plan is deterministic across engines/retries.
--     With a real lakehouse catalog, `files` comes from its metadata
--     table; the rewrite executes per (dir, bin), partition-pruned.
-- SELECT dir, file, size,
--   CASE WHEN bin0 IS NOT NULL AND nb >= 2 THEN 'compact' ELSE 'keep' END AS action,
--   CASE WHEN bin0 IS NOT NULL AND nb >= 2 THEN bin0 END                  AS bin
-- FROM (SELECT *, count(*) OVER (PARTITION BY dir, bin0) AS nb
--       FROM (SELECT *, CASE WHEN size < 134217728 THEN cumb // 134217728 END AS bin0
--             FROM (SELECT dir, file, size,
--                     coalesce(sum(CASE WHEN size < 134217728 THEN size ELSE 0 END)
--                       OVER (PARTITION BY dir ORDER BY size DESC, file
--                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
--                   FROM files) c) b) a;

-- 13. DataFrame-level round-6 operators with no SQL spelling here:
--     * ops/GraphRank.pageRank       — host-level quality prior over the
--       crawl link graph, exact BIGINT pico-rank units (p80).
--     * streaming/EventStreams.quotaAdmit / lateAudit — per-source ingest
--       rate limiting and out-of-orderness audit with one Long of state
--       per key; both equal their declarative window twins (s19/s20).
