package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase retrieval — the exact-phrase complement to the BM25
  * bag-of-words arm (p58): "did this exact k-gram occur, where, how
  * often" is the retrieval primitive behind quotation search,
  * memorization probes, and benchmark-contamination checks at the
  * PHRASE level (p55's shingle decontamination works on hashed 5-grams;
  * this answers arbitrary query phrases after the index exists).
  *
  * The index is the classic positional postings list, derived not
  * stored: one `posexplode` of the token arrays → (doc, word, pos).
  * A phrase of length k matches at base position p iff term i sits at
  * p + i for every i — so the search joins the postings stream against
  * the BROADCAST query terms (rides the scan, no corpus shuffle),
  * re-bases each hit to `pos − i`, and an occurrence is a (query, doc,
  * base) group containing ALL k term indexes. The only shuffle carries
  * the term-match stream, which query selectivity bounds — at 100 TB
  * the cost is the scan plus a match-sized exchange, never a
  * corpus-sized one.
  */
object PhraseIndex {

  /** `queries`: (qid, ph: array<string>). Returns (qid, doc_id, n_occ)
    * for every document containing the exact phrase at least once.
    * Duplicate terms inside a phrase are handled (the base-group counts
    * DISTINCT term indexes).
    */
  def phraseSearch(docs: DataFrame, idCol: String, tokensCol: String,
                   queries: DataFrame): DataFrame = {
    val postings = docs.select(col(idCol).as("doc_id"),
      posexplode(col(tokensCol)).as(Seq("pos", "word")))
    val qterms = queries.select(col("qid"),
      posexplode(col("ph")).as(Seq("k", "term")))
    val qlen = queries.select(col("qid"), size(col("ph")).as("qlen"))
    postings.join(broadcast(qterms), col("word") === col("term"))
      .select(col("qid"), col("doc_id"), (col("pos") - col("k")).as("base"),
        col("k"))
      .where(col("base") >= 0)
      .groupBy(col("qid"), col("doc_id"), col("base"))
      .agg(countDistinct(col("k")).as("nk"))
      .join(broadcast(qlen), Seq("qid"))
      .where(col("nk") === col("qlen"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
  }

  /** STREAMING-SAFE per-row form (the `blockedMatch` pattern): the
    * list-sized query set broadcasts and each row counts its own
    * occurrences with an array scan — no aggregation at all, so a
    * phrase WATCHLIST rides an append-mode micro-batch (quotation /
    * memorization alarms on ingest). Must elect the exact same
    * (qid, doc, count) rows as [[phraseSearch]]'s postings path
    * (OpsSpec differential).
    */
  def phraseScan(docs: DataFrame, idCol: String, tokensCol: String,
                 queries: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(tokensCol).as("w"))
      .crossJoin(broadcast(queries.select(col("qid"), col("ph"))))
      .where(size(col("w")) >= size(col("ph")))
      .withColumn("n_occ", expr(
        "cast(size(filter(sequence(1, size(w) - size(ph) + 1), i -> " +
          "forall(sequence(0, size(ph) - 1), " +
          "k -> element_at(w, cast(i + k as int)) = " +
          "element_at(ph, cast(k + 1 as int))))) as bigint)"))
      .where(col("n_occ") > 0)
      .select(col("qid"), col("doc_id"), col("n_occ"))
}
