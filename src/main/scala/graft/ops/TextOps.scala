package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` — pure
  * Catalyst expressions, whole-stage-codegen'd, no UDFs — so filters stack on
  * top of parquet scans and survive a 100 TB scale-up. Each has an exact
  * DuckDB SQL mirror used by the oracle harness (see queries.Pipeline).
  */
object TextOps {

  /** Non-empty whitespace-separated tokens. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def wordCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alnum runs and individual non-alnum, non-space
    * symbols each count as one token — a deterministic stand-in for a real
    * BPE vocab with the same plumbing shape.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct n-word shingles (space-joined) of the lowercased,
    * whitespace-tokenized text; empty when the document has fewer than n
    * words. The unit of the GPT-3-style benchmark-contamination check:
    * train docs sharing word n-grams with an eval set are flagged.
    */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(wordNgramsOf(tokens(lower(text)), n))

  /** Characters that survive removing all [a-zA-Z0-9 ] — punctuation mass. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  def punctRatio(text: Column): Column =
    when(length(text) > 0, punctCount(text).cast("double") / length(text)).otherwise(0.0)

  /** Small multilingual stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny and hard-coded: language ID at pipeline
    * scale is a per-row scan over a broadcast-size vocabulary.
    */
  val StopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "es", "no", "por")
  val StopwordsFr = Seq("le", "la", "et", "de", "un", "est", "pas", "que", "pour", "dans")

  private def hitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => array_contains(lit(words.toArray), t)))

  def stopwordCount(text: Column): Column = hitCount(text, StopwordsEn)

  def stopwordRatio(text: Column): Column =
    when(wordCount(text) > 0,
      stopwordCount(text).cast("double") / wordCount(text)).otherwise(0.0)

  /** Heuristic language ID: highest stopword-hit count wins, ties broken by
    * fixed language order, zero hits → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val en = hitCount(text, StopwordsEn)
    val de = hitCount(text, StopwordsDe)
    val es = hitCount(text, StopwordsEs)
    val fr = hitCount(text, StopwordsFr)
    val m = greatest(en, de, es, fr)
    when(m === 0, "und")
      .when(en === m, "en")
      .when(de === m, "de")
      .when(es === m, "es")
      .otherwise("fr")
  }

  /** Composite quality score in [0,1]: rewards moderate length, low
    * punctuation, presence of stopwords — the standard cheap pre-filter
    * before expensive pipeline stages.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * 0.4 + (lit(1.0) - punctPenalty) * 0.3 + stopScore * 0.3, 4)
  }

  /** PII patterns, written to the common subset of Java regex and RE2 (no
    * backreferences, no lookaround) so the Spark expressions and the DuckDB
    * oracle match the exact same spans. Deliberately high-recall/simple —
    * production scrubbing layers more patterns, the pipeline shape (chained
    * codegen'd regexp_replace over the scan, no UDFs) is what must scale.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3,}"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column):  Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Redact PII in place. Email first (its domain would otherwise survive as
    * an IP-shaped token), then IPs, then phones.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Candidate payment-card spans: 13-19 digits, optionally space/dash
    * separated, word-bounded. High-recall by design — a bare regex also
    * matches invoice numbers, tracking ids and timestamps, which is why
    * production scrubbing VALIDATES before redacting ([[luhnValid]]);
    * redacting every digit run would mangle legitimate text corpus-wide.
    */
  val CardRe = "\\b(\\d[ -]?){12,18}\\d\\b"

  /** Luhn checksum over one candidate span (separators stripped) as a pure
    * codegen'd HOF expression — no UDF: reverse the digits, double every
    * second one (subtracting 9 past 9), and the sum must be ≡ 0 (mod 10).
    * The same arithmetic is expressible verbatim in ANSI SQL, so the
    * DuckDB oracle validates the identical spans.
    */
  def luhnValid(cand: Column): Column = {
    val ds = reverse(regexp_replace(cand, "[ -]", ""))
    // split(s, "") can yield a trailing empty string (Java Pattern.split
    // with limit -1) — keep only real single-char cells
    val chars = filter(split(ds, ""), c => length(c) === 1)
    val pos = sequence(lit(1), size(chars))
    val terms = zip_with(chars, pos, (ch, i) => {
      val d = ch.cast("int")
      when(pmod(i, lit(2)) === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    size(chars) >= 13 && size(chars) <= 19 &&
      pmod(aggregate(terms, lit(0), (a, x) => a + x), lit(10)) === 0
  }

  /** Distinct card-shaped candidate spans in `text`, extraction order. */
  def cardCandidates(text: Column): Column =
    array_distinct(regexp_extract_all(text, lit(CardRe), lit(0)))

  /** The Luhn-valid subset of [[cardCandidates]]. */
  def validCards(text: Column): Column =
    filter(cardCandidates(text), luhnValid(_))

  /** Redact exactly the VALIDATED card numbers — an invoice number that
    * merely looks like a card survives. The fold replaces WORD-BOUNDED
    * occurrences (`\b…\b` regex per valid span, not a bare literal
    * replace): a valid card embedded inside a longer digit run is part
    * of THAT (non-card) number and must be left alone — a digit on
    * either side is a word character, so `\b` skips it. Candidates are
    * all `[0-9 -]`, so the span needs no regex escaping. "[CARD]"
    * contains no digits, so one replacement can never create a new
    * candidate for a later one.
    */
  def redactCards(text: Column): Column =
    aggregate(validCards(text), text,
      (acc, c) => regexp_replace(acc, concat(lit("\\b"), c, lit("\\b")),
        lit("[CARD]")))

  /** Fixed-size token chunks (n tokens each, space-rejoined, last chunk
    * ragged): the deterministic "line" unit for corpus-level line dedup on
    * text with no natural line structure. Empty array for empty text.
    */
  def tokenChunks(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) > 0,
      transform(sequence(lit(0), ceil(size(w).cast("double") / n).cast("int") - 1),
        i => array_join(slice(w, i * n + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Overlapping sliding token windows — size `n`, stride `s` (s < n gives
    * n−s tokens of overlap between neighbors): the RAG / long-context
    * chunking unit, where overlap preserves information that a hard cut at
    * a chunk boundary would sever. Chunk i covers tokens [i·s, i·s+n); the
    * last window is ragged; empty text yields no chunks. Pure per-row
    * expression (transform over a bounded index sequence) — chunking a
    * corpus is exactly one scan at any scale.
    *
    * Returns array<struct<chunk_idx, n_tok, chunk>>.
    */
  def slidingChunks(text: Column, n: Int, s: Int): Column = {
    require(n >= 1 && s >= 1, "window and stride must be positive")
    val w = tokens(text)
    // index of the last chunk: 0 when everything fits one window, else
    // ceil((|w|-n)/s) — kept in exact integer arithmetic (floor of a
    // positive ratio) so engines cannot disagree on chunk counts
    val last = when(size(w) <= n, lit(0))
      .otherwise(floor((size(w) - n + (s - 1)) / lit(s.toDouble)).cast("int"))
    when(size(w) > 0,
      transform(sequence(lit(0), last), i =>
        struct(
          i.cast("int").as("chunk_idx"),
          size(slice(w, i * s + 1, lit(n))).as("n_tok"),
          array_join(slice(w, i * s + 1, lit(n)), " ").as("chunk"))))
      .otherwise(array().cast("array<struct<chunk_idx:int,n_tok:int,chunk:string>>"))
  }

  /** ALL n-word grams of a token array (order kept, duplicates kept —
    * unlike [[wordShingles]], which dedupes): the unit of repetition
    * measurement. Empty below n words.
    */
  def wordNgramsOf(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Byte-pair-encoding vocabulary induction — the merge-table trainer.
    *
    * Classic BPE trains on the WORD-FREQUENCY table, not the corpus: one
    * corpus-wide HashAggregate builds (word, freq), and every merge
    * iteration after that touches only the vocabulary — which is the whole
    * reason the algorithm scales to 100 TB (the corpus is read once; the
    * iterative part is vocab-sized). Each iteration: count adjacent symbol
    * pairs weighted by word frequency (explode + HashAggregate), pick the
    * most frequent pair (count desc, pair asc — the determinism contract),
    * and greedily merge it left-to-right in every word's symbol sequence
    * (space-sentinel `replace`, identical non-overlapping scan semantics in
    * Spark and DuckDB). The driver collects ONE row per iteration (the
    * winning pair) — the same bounded-collect pattern as IVF centroid
    * training.
    *
    * Returns the merge table: (merge_rank, pair, merged, n_pairs).
    */
  def bpeMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
                nMerges: Int): org.apache.spark.sql.DataFrame =
    bpeMergesOn(df, textCol, nMerges, charSymbols)

  /** Char-alphabet symbol row: one symbol per character. */
  private def charSymbols(w: Column): Column =
    array_join(regexp_extract_all(w, lit("."), lit(0)), "  ")

  /** Byte-alphabet symbol row (VERDICT r12 #4 — the GPT-2/tiktoken
    * class): symbols are the pretoken's UTF-8 BYTES as fixed-width
    * 2-hex-digit codes, so the base alphabet is 256 symbols and NO
    * input is out-of-vocabulary — a multi-byte code point starts as its
    * byte pieces and merges climb from there. The fixed-width hex
    * rename is ORDER-PRESERVING (space < '0'..'9' < 'A'..'F' mirrors
    * the byte order), so on ASCII-only corpora the tie-break `(count
    * DESC, pair ASC)` elects the same merge sequence as the char
    * trainer — the differential BpeSpec pins exactly that.
    */
  private def byteSymbols(w: Column): Column =
    array_join(regexp_extract_all(hex(encode(w, "UTF-8")), lit(".."), lit(0)), "  ")

  /** [[bpeMerges]] on the 256-byte base alphabet (same pretokenizer,
    * same driver-bounded merge loop; pairs/merges are hex-coded).
    */
  def bpeMergesBytes(df: org.apache.spark.sql.DataFrame, textCol: String,
                     nMerges: Int): org.apache.spark.sql.DataFrame =
    bpeMergesOn(df, textCol, nMerges, byteSymbols)

  private def bpeMergesOn(df: org.apache.spark.sql.DataFrame, textCol: String,
                          nMerges: Int,
                          symbolize: Column => Column): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wordFreq = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
    // Symbols are separated by TWO spaces and the row is framed by single
    // sentinel spaces, so every symbol OWNS one space on each side. A merge
    // pattern " x  y " consumes only owned spaces and its replacement
    // " xy " restores one per side — separators stay double after every
    // pass, so one left-to-right non-overlapping replace() IS canonical
    // greedy BPE even through runs of repeated symbols ("a a a a" pairs as
    // (1,2)(3,4), not alternately: the old single-space scheme consumed the
    // shared boundary space and skipped every other occurrence).
    var seqs = wordFreq
      .select(col("wf"), symbolize(col("w")).as("seq"))
      .persist()
    seqs.count() // materialize once; iterations re-derive from here
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      for (i <- 1 to nMerges) {
        val top = seqs
          .select(col("wf"), explode(wordNgramsOf(split(col("seq"), "  "), 2)).as("g"))
          .groupBy(col("g")).agg(sum(col("wf")).as("c"))
          .orderBy(col("c").desc, col("g")).limit(1)
          .collect()
        if (top.nonEmpty) {
          val pair = top.head.getString(0); val cnt = top.head.getLong(1)
          val merged = pair.replace(" ", "")
          merges += ((i, pair, merged, cnt))
          val next = seqs.select(col("wf"),
            trim(replace(
              concat(lit(" "), col("seq"), lit(" ")),
              lit(s" ${pair.replace(" ", "  ")} "), lit(s" $merged "))).as("seq"))
            .persist()
          next.count()
          seqs.unpersist()
          seqs = next
        }
      }
    } finally seqs.unpersist()
    merges.toSeq.toDF("merge_rank", "pair", "merged", "n_pairs")
  }

  /** Apply a trained BPE merge table to text: encode each word's character
    * sequence by replaying the merges IN TRAINING ORDER (BPE's apply-time
    * contract). The merge table is driver-resident (vocab-sized), so the
    * encoder folds it into a chain of per-row sentinel `replace`
    * expressions — pure codegen, no UDF, no join, no iteration at apply
    * time; the per-word symbol split rides an existing transform. Returns
    * the token count after merging (the real sequence length a trainer
    * would batch on, vs the [[bpeishTokenCount]] heuristic).
    */
  def bpeEncodeCount(text: Column, merges: Seq[(String, String)]): Column =
    bpeEncodeCountOn(text, merges, charSymbols)

  /** [[bpeEncodeCount]] over the byte alphabet — counts tokens after
    * replaying a [[bpeMergesBytes]] table in training order.
    */
  def bpeEncodeCountBytes(text: Column, merges: Seq[(String, String)]): Column =
    bpeEncodeCountOn(text, merges, byteSymbols)

  private def bpeEncodeCountOn(text: Column, merges: Seq[(String, String)],
                               symbolize: Column => Column): Column = {
    val words = tokens(lower(text))
    val encoded = transform(words, w => {
      // double-space separators + owned sentinel spaces: see bpeMerges —
      // one replace per rule is exact canonical greedy application
      val merged = merges.foldLeft(
        concat(lit(" "), symbolize(w), lit(" ")): Column) { case (acc, (pair, m)) =>
        replace(acc, lit(s" ${pair.replace(" ", "  ")} "), lit(s" $m "))
      }
      size(split(trim(merged), "  "))
    })
    coalesce(aggregate(encoded, lit(0), _ + _), lit(0))
  }

  /** CCNet-style character-LM quality score: train a character-trigram model
    * on the corpus itself, then score each document by its mean negative
    * log-likelihood under the model — high nll means unusual character
    * statistics (boilerplate, encoding garbage, non-language runs), the
    * classic LM-perplexity quality filter.
    *
    * Text is alphabet-normalized to `[a-z0-9 ]` first, which bounds the
    * model at 37³ trigrams REGARDLESS of corpus size — so the plan shape
    * survives 100 TB: two hash aggregations over the exploded trigram stream
    * (both partial-aggregate map-side; training output is alphabet-bounded,
    * not data-bounded), a broadcast join of the model back onto the stream,
    * and one per-document aggregation whose shuffle carries a single row per
    * document (the explode keeps a document's trigrams partition-local, so
    * the sum combines before the exchange). Per-term log-probs round to 6 dp
    * before summing: the sum of 1e-6-quantized terms is order-stable far
    * below the emitted 4 dp, which is the cross-engine determinism contract
    * (same discipline as p19/p21).
    *
    * Returns (idCol, n_tris, nll) for documents with ≥3 normalized chars.
    */
  def charLmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame =
    charLmScoreWith(charLmModel(df, textCol), df, idCol, textCol)

  /** Char-trigram stream of the alphabet-normalized text, carrying `keep`
    * alongside (docs with < 3 normalized chars drop here, in training and
    * scoring alike).
    */
  private def charTrigrams(df: org.apache.spark.sql.DataFrame, keep: Seq[Column],
                           textCol: String) =
    // Spread.cpu: the trigram explode + normalization is the CPU-heavy
    // stage; a single-file corpus otherwise runs it on one core (r13
    // profiler: p48's two corpus passes were single-task, 2-3 s each)
    Spread.cpu(df).select(keep :+
        trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")).as("__graft_t"): _*)
      .filter(length(col("__graft_t")) >= 3)
      .select(keep :+ explode(expr(
        "transform(sequence(1, length(__graft_t) - 2), i -> substr(__graft_t, i, 3))"))
        .as("tri"): _*)

  /** Train the trigram model: (tri, logp) with logp = round(ln(P(c3|c1c2)), 6).
    * Output is alphabet-bounded (≤ 37³ rows) however large the corpus.
    */
  def charLmModel(df: org.apache.spark.sql.DataFrame,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    val triCnt = charTrigrams(df, Seq.empty, textCol)
      .groupBy(col("tri")).agg(count(lit(1)).as("tc"))
    val bigCnt = triCnt.groupBy(substring(col("tri"), 1, 2).as("big"))
      .agg(sum(col("tc")).as("bc"))
    triCnt.join(bigCnt, substring(triCnt("tri"), 1, 2) === bigCnt("big"))
      .select(col("tri"), round(log(col("tc").cast("double") / col("bc")), 6).as("logp"))
  }

  /** Score `df` under an already-trained model — the train-offline /
    * score-online split: `model` may come from a different (larger, earlier)
    * corpus, and `df` may be a STREAM (every stage here is stateless except
    * the final per-doc aggregation). Unseen trigrams are dropped from both
    * the numerator and n_tris (matches self-trained scoring, where none are
    * unseen).
    */
  def charLmScoreWith(model: org.apache.spark.sql.DataFrame,
                      df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame =
    charTrigrams(df, Seq(col(idCol)), textCol)
      .join(broadcast(model), "tri")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tris"),
        round(-sum(col("logp")) / count(lit(1)), 4).as("nll"))

  /** Gopher-style repetition metrics per document: the standard
    * quality-filter family that catches boilerplate and degenerate
    * repetition which length/punctuation stats miss.
    *
    * Output per id: n_words, frac_unique_words (distinct/total),
    * frac_top_2gram (occurrences of the most frequent word 2-gram over all
    * 2-gram occurrences), frac_dup_3grams (occurrences of 3-grams that
    * appear more than once, over all 3-gram occurrences).
    *
    * Physical shape: explode + two-level HashAggregate per n — map-side
    * partials carry (doc, gram) counts, the per-doc rollup carries three
    * numbers per doc. No windows, no per-doc sorts — scan-parallel at any
    * corpus size.
    */
  /** BM25 top-k retrieval (Robertson/Spärck Jones): score each document
    * against a small query set, keep the k best per query — the classic
    * keyword-retrieval stage a curation pipeline runs to pull topical
    * slices out of a corpus. Standard Okapi form:
    * idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with
    * idf = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Cross-engine float contract: each per-term contribution is quantized
    * to integer MICRO-units (round(term·1e6) as BIGINT) BEFORE the
    * per-(query, doc) sum, so the sum is exact integer arithmetic —
    * order-independent across engines and partitionings — and the rank
    * key is the integer itself. The only doubles that cross engines are
    * single expressions (ln, one division chain) evaluated identically.
    *
    * Scale shape: one corpus explode feeding two map-side-combined
    * HashAggregates (tf and dl), corpus-level stats as a 1-row broadcast,
    * query terms and their df as broadcast joins, final per-query top-k
    * window over matching docs only.
    *
    * Persist lifecycle (VERDICT r5 #5): `toks`/`tf` are cached
    * (MEMORY_AND_DISK) while the plan reads each several times, the tiny
    * top-k result is SEALED (lazy localCheckpoint — after the caller's
    * first action its lineage no longer references the caches) and the
    * caches released the moment that checkpoint lands
    * ([[CacheHygiene.sealAndRelease]]). Library callers accumulate
    * nothing across invocations; the spec asserts zero leaked persists
    * post-materialization.
    */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, Seq[String])], k1: Double = 1.2,
               b: Double = 0.75, topK: Int = 10): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc"), explode(tokens(lower(col(textCol)))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = toks.groupBy($"doc", $"term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = toks.groupBy($"doc").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg($"dl").as("avgdl"))
    val qterms = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "term")
    val dfreq = tf.join(broadcast(qterms.select($"term").distinct()), "term")
      .groupBy($"term").agg(count(lit(1)).as("dfq"))
    // association mirrors the oracle SQL token-for-token: the quantized
    // micro-unit is the rank key, so even last-ulp drift is not allowed
    val idf = log(lit(1.0) + ($"n" - $"dfq" + lit(0.5)) / ($"dfq" + lit(0.5)))
    val denom = $"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / $"avgdl")
    val terms = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, "doc")
      .crossJoin(broadcast(stats))
      .select($"qid", $"doc",
        round(idf * $"tf" * lit(k1 + 1.0) / denom * lit(1e6)).cast("long").as("ppm"))
    val w = Window.partitionBy($"qid").orderBy(desc("sppm"), asc("doc"))
    val ranked = terms.groupBy($"qid", $"doc").agg(sum($"ppm").as("sppm"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= topK)
      .select($"qid", $"rank", $"doc",
        round($"sppm".cast("double") / 1e6, 4).as("score"))
    // seal (queries × topK rows — tiny) and release the corpus caches
    // once the caller's first action lands the checkpoint
    CacheHygiene.sealAndRelease(ranked, toks, tf)
  }

  /** Gopher-style word-shape gate — the word-level half of the Gopher
    * quality rules (repetition lives in [[repetitionStats]], punctuation/
    * length in the p02/p03 stats): word-count bounds, mean word length in
    * [3, 10], fraction of words containing an alphabetic character, and a
    * minimum stopword presence. Every stat is an integer sum divided once
    * and rounded once, and the ROUNDED value feeds the keep verdict — the
    * cross-engine contract that lets thresholds sit exactly on a 4-dp
    * boundary. Pure per-row expressions: no explode, no shuffle.
    */
  def gopherGate(df: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String): org.apache.spark.sql.DataFrame = {
    val w = tokens(col(textCol))
    val nWords = size(w)
    val sumLen = aggregate(transform(w, t => length(t).cast("long")),
      lit(0L), (a, x) => a + x)
    val nAlpha = size(filter(w, t => t.rlike("[A-Za-z]")))
    df.select(col(idCol), nWords.cast("long").as("n_words"),
        round(when(nWords > 0, sumLen.cast("double") / nWords)
          .otherwise(0.0), 4).as("mean_word_len"),
        round(when(nWords > 0, nAlpha.cast("double") / nWords)
          .otherwise(0.0), 4).as("frac_alpha_words"),
        stopwordCount(col(textCol)).cast("long").as("n_stopwords"))
      .withColumn("keep",
        (col("n_words") >= 15 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("frac_alpha_words") >= 0.8 && col("n_stopwords") >= 2).cast("int"))
  }

  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    val id = col(idCol)
    val base = df.select(id, tokens(lower(col(textCol))).as("__w"))
    val wstats = base.select(id, explode(col("__w")).as("t"))
      .groupBy(id).agg(count(lit(1)).as("n_words"),
        countDistinct(col("t")).as("__uniq"))
    def gramAgg(n: Int, totalName: String, aggCol: Column, aggName: String) =
      base.select(id, explode(wordNgramsOf(col("__w"), n)).as("g"))
        .groupBy(id, col("g")).agg(count(lit(1)).as("c"))
        .groupBy(id).agg(sum(col("c")).as(totalName), aggCol.as(aggName))
    val g2 = gramAgg(2, "__n2", max(col("c")), "__top2")
    val g3 = gramAgg(3, "__n3",
      sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))), "__dup3")
    wstats
      .join(g2, Seq(idCol), "left")
      .join(g3, Seq(idCol), "left")
      .select(id, col("n_words"),
        when(col("n_words") > 0,
          round(col("__uniq").cast("double") / col("n_words"), 4))
          .otherwise(0.0).as("frac_unique_words"),
        coalesce(when(col("__n2") > 0,
          round(col("__top2").cast("double") / col("__n2"), 4)), lit(0.0))
          .as("frac_top_2gram"),
        coalesce(when(col("__n3") > 0,
          round(col("__dup3").cast("double") / col("__n3"), 4)), lit(0.0))
          .as("frac_dup_3grams"))
  }

  /** Word-level bigram LM with Stupid Backoff (Brants et al. 2007) — the
    * perplexity upgrade over [[charLmScore]]'s char trigrams: word
    * statistics catch fluency defects character n-grams can't see.
    * Train on `trainFilter` docs, score `scoreFilter` docs (a held-out
    * split makes the BACKOFF arm load-bearing: unseen bigrams fall back
    * to the smoothed unigram).
    *
    * Model bounding (the charLM discipline, for an UNBOUNDED vocab):
    * the top-`vocabSize` training words by (count desc, word asc) are
    * the vocabulary; every other token maps to `<unk>`. Scores:
    *   seen bigram:   c(w1 w2) / c(w1 ·)
    *   unseen bigram: 0.4 · (c(w2) + 1) / (N + vocabSize + 1)
    * (add-one on the unigram keeps the backoff total even for an unseen
    * `<unk>`). Each ln-term quantizes to integer MICRO-units before the
    * per-doc sum — the exact-sum determinism contract — and the emitted
    * nll rounds once to 4 dp.
    *
    * Scale shape: vocab/unigram/context tables are vocabSize-bounded
    * (eagerly localCheckpoint'ed — they feed 2-4 consumers each and
    * must not re-scan the corpus per consumer) and broadcast into the
    * scoring stream; the bigram model is the one data-bound table and
    * joins by (w1, w2) key. Everything else is explode + map-side-
    * combined HashAggregates — no windows over corpus-scale data (the
    * vocab election sorts the word-COUNT table, not the corpus).
    */
  /** The trained word-LM tables: vocab (≤ vocabSize words), mapped
    * unigram counts, bigram counts, bigram-prefix counts, and the total
    * training token count. vocab/uni/cp are vocab-bounded; bc is the
    * one data-bound table.
    */
  final case class WordLmModel(vocab: org.apache.spark.sql.DataFrame,
                               uni: org.apache.spark.sql.DataFrame,
                               bc: org.apache.spark.sql.DataFrame,
                               cp: org.apache.spark.sql.DataFrame,
                               n: Long, vocabSize: Int)

  private def wordLmToks(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String) =
    df.select(col(idCol).as("doc_id"),
        filter(split(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")),
          " "), x => x =!= "").as("w"))
      .where(size(col("w")) >= 2)

  private def wordLmBigrams(src: org.apache.spark.sql.DataFrame) = src
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(w) - 1), " +
        "i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))"))
      .as("pr"))
    .select(col("doc_id"), col("pr.a").as("rw1"), col("pr.b").as("rw2"))

  private def wordLmMapped(vocab: org.apache.spark.sql.DataFrame,
                           src: org.apache.spark.sql.DataFrame,
                           c: String, out: String) =
    src.join(broadcast(vocab.select(col("word").as(c), lit(1).as(s"__in_$c"))),
        Seq(c), "left")
      .withColumn(out, when(col(s"__in_$c").isNotNull, col(c))
        .otherwise(lit("<unk>")))
      .drop(c, s"__in_$c")

  /** Train the bigram model on `df` rows passing `trainFilter` — the
    * offline half of the train-offline / score-online split (the
    * charLmModel/charLmScoreWith shape at the word level).
    */
  def wordLmModel(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, trainFilter: Column,
                  vocabSize: Int = 1000): WordLmModel = {
    val toks = wordLmToks(df.where(trainFilter), idCol, textCol)
    val trainToks = toks.select(col("doc_id"), explode(col("w")).as("word"))
    val vocab = trainToks.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc).limit(vocabSize)
      .select(col("word")).localCheckpoint(true)
    val uni = wordLmMapped(vocab, trainToks, "word", "mw")
      .groupBy(col("mw").as("uw")).agg(count(lit(1)).as("uc"))
      .localCheckpoint(true)
    val n = uni.agg(sum(col("uc"))).head().getLong(0)
    val trb = wordLmMapped(vocab, wordLmMapped(vocab, wordLmBigrams(toks),
      "rw1", "w1"), "rw2", "w2")
    val bc = trb.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val cp = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    WordLmModel(vocab, uni, bc, cp, n, vocabSize)
  }

  /** Score `df` under an already-trained model — every stage here is
    * stateless except the final per-doc aggregation, so a STREAM scores
    * per micro-batch exactly like the batch path (s34).
    */
  def wordLmScoreWith(m: WordLmModel, df: org.apache.spark.sql.DataFrame,
                      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val scm = wordLmMapped(m.vocab, wordLmMapped(m.vocab,
      wordLmBigrams(wordLmToks(df, idCol, textCol)), "rw1", "w1"), "rw2", "w2")
    val term = when(col("c12").isNotNull,
        round(log(col("c12").cast("double") / col("c1")) * 1e6))
      .otherwise(round(log(lit(0.4) * (coalesce(col("uc"), lit(0L)) + 1) /
        lit(m.n + m.vocabSize + 1)) * 1e6))
      .cast("long")
    scm.join(m.bc, Seq("w1", "w2"), "left")
      .join(broadcast(m.cp), Seq("w1"), "left")
      .join(broadcast(m.uni), col("w2") === col("uw"), "left")
      .select(col("doc_id"), term.as("t"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("t")).cast("double") / (count(lit(1)) * 1e6), 4).as("nll"))
  }

  def wordLmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, trainFilter: Column, scoreFilter: Column,
                  vocabSize: Int = 1000): org.apache.spark.sql.DataFrame =
    wordLmScoreWith(wordLmModel(df, idCol, textCol, trainFilter, vocabSize),
      df.where(scoreFilter), idCol, textCol)
}
