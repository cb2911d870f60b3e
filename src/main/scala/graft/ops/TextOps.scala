package graft.ops

import org.apache.spark.sql.Column
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
  def wordShingles(text: Column, n: Int): Column = {
    val w = tokens(lower(text))
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

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
}
