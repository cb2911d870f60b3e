package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene passes a crawl pipeline runs between extraction and
  * dedup: per-source boilerplate LINE removal (the CCNet/RefinedWeb step
  * that strips nav bars, cookie banners and footers repeated across a
  * host's pages — they survive `html_text` because they ARE text) and
  * secret scrubbing (the memorization-risk layer: API-key-shaped
  * high-entropy tokens redacted before a model can memorize them; the
  * precision complement of the PII regexes in [[TextOps.redactPii]] and
  * the Luhn gate in [[TextOps.redactCards]]).
  *
  * Scale contract (100 TB):
  *  - Boilerplate discovery shuffles (source, line)-keyed COUNTS — with
  *    `hashLines=true` the shuffle key is the 8-byte xxhash64 of the line
  *    (the p51 substring-span trick), never line text. The verdict table
  *    is bounded by the distinct-line count above the frequency floor and
  *    joins back per SOURCE as one small array (broadcast-sized: a host's
  *    boilerplate vocabulary is tiny even when the host is huge).
  *  - Secret detection/redaction is a pure per-row expression chain
  *    (split → HOF filters → fold), codegen-friendly, shuffle-free — it
  *    rides the scan like the other quality gates.
  */
object Hygiene {

  private val Nl = "\n"

  /** Per-(source, line) document frequency over the corpus. Two-level
    * aggregate so a line repeated INSIDE one doc counts once; the
    * distinct and the count both combine map-side, so the shuffle
    * carries one row per distinct (source, line-or-hash, doc) — at crawl
    * scale, with `hashLines`, that's three fixed-width words per
    * occurrence.
    */
  def lineDocFreq(pages: DataFrame, srcCol: String, docCol: String,
                  pageCol: String, hashLines: Boolean = false): DataFrame = {
    val key: Column => Column =
      if (hashLines) l => xxhash64(l) else identity
    pages
      .select(col(srcCol).as("source"), col(docCol).as("doc"),
        explode(split(col(pageCol), Nl)).as("raw_line"))
      .select(col("source"), col("doc"), key(col("raw_line")).as("line"))
      .distinct()
      .groupBy(col("source"), col("line"))
      .agg(count(lit(1)).as("df_docs"))
  }

  /** Boilerplate verdict: a line is boilerplate within its source when it
    * appears in at least `minDocs` documents AND in at least
    * fracNum/fracDen of the source's documents — both tests in exact
    * integer arithmetic (`df·fracDen >= n·fracNum`), so the threshold can
    * never flip on a float rounding difference between engines. Returns
    * one row per source: (source, bp) with bp the sorted line (or hash)
    * array — the broadcast-ready form.
    */
  def boilerplateTable(pages: DataFrame, srcCol: String, docCol: String,
                       pageCol: String, minDocs: Int = 2, fracNum: Int = 1,
                       fracDen: Int = 2, hashLines: Boolean = false): DataFrame = {
    val df = lineDocFreq(pages, srcCol, docCol, pageCol, hashLines)
    val srcDocs = pages.groupBy(col(srcCol).as("source"))
      .agg(count_distinct(col(docCol)).as("n_docs"))
    df.join(broadcast(srcDocs), "source")
      .where(col("df_docs") >= minDocs &&
        col("df_docs") * fracDen >= col("n_docs") * fracNum)
      .groupBy(col("source"))
      .agg(sort_array(collect_list(col("line"))).as("bp"))
  }

  /** Strip a source's boilerplate lines from each page, preserving the
    * order of the surviving lines. The verdict table joins by source
    * (broadcast); membership is an array_contains over the source's small
    * boilerplate set, per row, inside the scan stage. Emits the cleaned
    * text plus line-count audit columns; a page whose every line was
    * boilerplate comes back as the empty string (never NULL) so digests
    * stay well-defined.
    */
  def stripBoilerplate(pages: DataFrame, bp: DataFrame, srcCol: String,
                       docCol: String, pageCol: String,
                       hashLines: Boolean = false): DataFrame = {
    val joined = pages.join(
      broadcast(bp.withColumnRenamed("source", "__bp_source")),
      pages(srcCol) === col("__bp_source"), "left")
    // NULL page degrades to the empty page (split(NULL) is NULL and
    // size(NULL) is -1 — a crawl row with no body must not emit negative
    // audit counts)
    val lines = split(coalesce(col(pageCol), lit("")), Nl)
    val key: Column => Column = if (hashLines) l => xxhash64(l) else identity
    val kept = filter(lines, l =>
      !coalesce(array_contains(col("bp"), key(l)), lit(false)))
    joined.select(col(docCol).as("doc"), col(srcCol).as("source"),
      size(lines).cast("int").as("n_lines"),
      size(kept).cast("int").as("n_kept"),
      array_join(kept, Nl).as("clean"))
  }

  // ---- confusable-skeleton (homoglyph) dedup key ---------------------------

  /** Homoglyph fold table (Unicode TR39-style confusables, the subset
    * that round-trips as single chars through `translate`): Cyrillic and
    * Greek lowercase letters that render identically to Latin ones — the
    * script-mixing trick SEO spam uses to slip copies past exact AND
    * canonical dedup (`p40` lowercases and strips punctuation but never
    * folds scripts, so "sсаm" with Cyrillic с/а hashes differently).
    */
  val ConfusableFrom = "аеорсхуѕіјԛԝο"
  val ConfusableTo = "aeopcxysijqwo"

  /** The skeleton dedup key: NFC → lowercase → homoglyph fold. Pure
    * per-row expression chain; the dedup that uses it pays exactly one
    * digest-keyed shuffle, like every other dedup pass here.
    */
  def confusableSkeleton(text: Column): Column =
    translate(lower(call_function("nfc_normalize", text)),
      ConfusableFrom, ConfusableTo)

  // ---- secret scrub ------------------------------------------------------

  /** Whitespace tokens of `textCol`, as a SQL fragment (HOF lambdas need
    * textual composition — the Column API can't bind a lambda variable
    * inside substr).
    */
  private def tokensSql(textCol: String): String =
    s"filter(split($textCol, ' '), t -> length(t) > 0)"

  /** Candidate filter body: API-key-shaped — long (>= minLen), machine
    * alphabet ([A-Za-z0-9_-] only) and mixed-class (at least one digit,
    * one lower, one upper). A hex blob fails (single case); a
    * natural-language word fails (no digit).
    */
  private def candidatesSql(textCol: String, minLen: Int): String =
    // one pass over the raw split: the length floor subsumes the
    // empty-token filter (minLen >= 1), and short-circuits the regexes
    // off every normal word
    s"""filter(split($textCol, ' '), t ->
       |  length(t) >= ${math.max(minLen, 1)}
       |  AND t RLIKE '^[A-Za-z0-9_-]+$$'
       |  AND t RLIKE '[0-9]' AND t RLIKE '[a-z]' AND t RLIKE '[A-Z]')""".stripMargin

  /** Shannon character entropy of token `t` (a SQL lambda variable), in
    * exact-integer MICRO-bits: each distinct character's term
    * −(n_c/L)·log2(n_c/L) is rounded to micro-units BEFORE the sum (the
    * p48/p58 float-order-stability discipline — a sum of pre-rounded
    * BIGINTs is identical across engines and partitionings where a sum
    * of raw doubles is not).
    */
  private def entropySql(tv: String): String = {
    def chars(v: String) =
      s"transform(sequence(1, length($tv)), $v -> substr($tv, $v, 1))"
    val cnt = s"CAST(size(filter(${chars("j")}, x -> x = c)) AS DOUBLE) / length($tv)"
    s"""aggregate(array_distinct(${chars("i")}), 0L,
       |  (acc, c) -> acc + CAST(round(-($cnt) * log2($cnt) * 1e6) AS BIGINT))""".stripMargin
  }

  /** Array of detected secret tokens (distinct): candidates whose
    * character entropy clears `minMicroBits` (default 3.0 bits —
    * random-ish keys sit near log2(alphabet) ≈ 4 bits; repeated-character
    * padding and word-like tokens sit far below).
    */
  def secretTokens(textCol: String, minLen: Int = 24,
                   minMicroBits: Long = 3000000L): Column =
    expr(secretsSql(textCol, minLen, minMicroBits))

  private def secretsSql(textCol: String, minLen: Int, minMicroBits: Long): String =
    s"""array_distinct(filter(${candidatesSql(textCol, minLen)},
       |  t -> ${entropySql("t")} >= ${minMicroBits}L))""".stripMargin

  /** Candidate tokens (pre-entropy), for audit columns. */
  def secretCandidates(textCol: String, minLen: Int = 24): Column =
    expr(candidatesSql(textCol, minLen))

  /** Staged form: entropy-gate a PRECOMPUTED candidates column. HOFs are
    * CodegenFallback, so multi-column outputs get no common-subexpression
    * elimination — a query that needs candidate counts, secrets AND the
    * redacted text should materialize each stage as a column (Catalyst's
    * CollapseProject keeps non-cheap expressions staged) instead of
    * re-deriving the whole chain per output column.
    */
  def secretTokensFrom(candsCol: String,
                       minMicroBits: Long = 3000000L): Column =
    expr(s"""array_distinct(filter($candsCol,
            |  t -> ${entropySql("t")} >= ${minMicroBits}L))""".stripMargin)

  /** Staged form: fold a PRECOMPUTED secrets column over the text. */
  def redactFrom(textCol: String, secretsCol: String): Column =
    expr(s"aggregate($secretsCol, $textCol, (acc, t) -> replace(acc, t, '[SECRET]'))")

  /** Redact every detected secret: a left fold of plain `replace` over
    * the (long, random — collision-free in practice) offending tokens.
    * Plain replace (not regexp) keeps the fold cheap and byte-identical
    * across engines.
    */
  def redactSecrets(textCol: String, minLen: Int = 24,
                    minMicroBits: Long = 3000000L): Column =
    expr(s"""aggregate(${secretsSql(textCol, minLen, minMicroBits)},
            |  $textCol, (acc, t) -> replace(acc, t, '[SECRET]'))""".stripMargin)
}
