package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised quality classification — the CCNet/GPT-3 filtering step: a
  * linear text classifier trained on a small labeled seed ("pages like
  * Wikipedia" vs "random crawl") and applied to every document. The
  * countable model here is binary multinomial Naive Bayes with add-one
  * smoothing, which IS a linear classifier (per-word weight
  * w = log P(word|pos) − log P(word|neg), bias = the prior log-odds), so
  * the train and apply passes are nothing but word-count aggregates — the
  * only NB-vs-SGD difference that survives at 100 TB is that NB's "training"
  * is one deterministic counting pass.
  *
  * Scale contract:
  *  - Training reduces the labeled seed to a VOCAB-bounded weight table
  *    plus a 1-row constant table; both broadcast at apply time.
  *  - Apply is one per-(doc, word) map-side-combined HashAggregate over
  *    the corpus followed by a broadcast join — the corpus is read once,
  *    nothing corpus-scale ever sorts or collects.
  *  - All log terms quantize to integer MICRO-units BEFORE summation
  *    (the p48/p58 discipline), so scores are exact BIGINT arithmetic:
  *    identical across engines, partitionings and retries.
  */
object Classify {

  /** round(ln(x)·1e6) as BIGINT — the quantized log unit. */
  private def qlog(x: Column): Column =
    round(log(x) * lit(1e6)).cast("long")

  private def words(textCol: String): Column =
    expr(s"filter(split($textCol, ' '), t -> length(t) > 0)")

  /** Train: per-word weight table (word, w_micro) with
    * w = qlog((c_pos+1)/(t_pos+V)) − qlog((c_neg+1)/(t_neg+V)) over the
    * labeled seed's joint vocabulary (V = |vocab|, t_c = class token
    * totals). Bounded at vocab size — the broadcastable model.
    */
  def nbWeights(labeled: DataFrame, classCol: String, textCol: String,
                posClass: String): DataFrame = {
    val toks = labeled.select(
      when(col(classCol) === posClass, lit(1L)).otherwise(lit(0L)).as("is_pos"),
      explode(words(textCol)).as("word"))
    val cw = toks.groupBy(col("word")).agg(
      sum(col("is_pos")).as("c_pos"),
      sum(lit(1L) - col("is_pos")).as("c_neg"))
    val stats = cw.agg(
      sum(col("c_pos")).as("t_pos"), sum(col("c_neg")).as("t_neg"),
      count(lit(1)).as("v"))
    cw.crossJoin(broadcast(stats)).select(
      col("word"),
      (qlog((col("c_pos") + 1).cast("double") / (col("t_pos") + col("v"))) -
        qlog((col("c_neg") + 1).cast("double") / (col("t_neg") + col("v"))))
        .as("w_micro"))
  }

  /** Train: the 1-row constant table (w_unk_micro, prior_micro) — the
    * weight applied to apply-time words OUTSIDE the training vocabulary
    * (add-one smoothing's (0+1)/(t_c+V) arm) and the prior log-odds from
    * the labeled class frequencies.
    */
  def nbConsts(labeled: DataFrame, classCol: String, textCol: String,
               posClass: String): DataFrame = {
    val toks = labeled.select(
      when(col(classCol) === posClass, lit(1L)).otherwise(lit(0L)).as("is_pos"),
      explode(words(textCol)).as("word"))
    val stats = toks.groupBy(col("word")).agg(
      sum(col("is_pos")).as("c_pos"),
      sum(lit(1L) - col("is_pos")).as("c_neg"))
      .agg(sum(col("c_pos")).as("t_pos"), sum(col("c_neg")).as("t_neg"),
        count(lit(1)).as("v"))
    val docs = labeled.agg(
      sum(when(col(classCol) === posClass, 1L).otherwise(0L)).as("d_pos"),
      count(lit(1)).as("d_all"))
    stats.crossJoin(docs).select(
      (qlog(lit(1.0) / (col("t_pos") + col("v"))) -
        qlog(lit(1.0) / (col("t_neg") + col("v")))).as("w_unk_micro"),
      (qlog(col("d_pos").cast("double") / col("d_all")) -
        qlog((col("d_all") - col("d_pos")).cast("double") / col("d_all")))
        .as("prior_micro"))
  }

  /** Apply: score every document — score = Σ_tokens w(word) + prior in
    * exact micro-units, pred = posClass iff score ≥ 0. Total: a document
    * with no tokens scores the bare prior (never dropped). The weight
    * and constant tables broadcast; the corpus-side work is one
    * map-side-combined (doc, word) count aggregate.
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              weights: DataFrame, consts: DataFrame,
              posClass: String, negClass: String): DataFrame = {
    val dt = docs
      .select(col(idCol).as("id"), explode(words(textCol)).as("word"))
      .groupBy(col("id"), col("word")).agg(count(lit(1)).as("cnt"))
    val summed = dt.join(broadcast(weights), Seq("word"), "left")
      .crossJoin(broadcast(consts.select(col("w_unk_micro"))))
      .groupBy(col("id"))
      .agg(sum(col("cnt")).cast("long").as("n_tokens"),
        sum(col("cnt") * coalesce(col("w_micro"), col("w_unk_micro")))
          .as("s"))
    docs.select(col(idCol).as("id"))
      .join(summed, Seq("id"), "left")
      .crossJoin(broadcast(consts.select(col("prior_micro"))))
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("s"), lit(0L)) + col("prior_micro")).as("score_micro"),
        when(coalesce(col("s"), lit(0L)) + col("prior_micro") >= 0, posClass)
          .otherwise(negClass).as("pred"))
  }
}
