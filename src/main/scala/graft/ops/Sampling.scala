package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, shuffle-free sampling for training-data pipelines.
  *
  * Every decision derives from a salted md5 of the row's stable id, so a
  * sample is reproducible across runs, engines, and cluster layouts —
  * unlike `df.sample` (rand()-seeded per task attempt, so a retried
  * partition yields a different subset). The whole operator is a per-row
  * projection + filter: no shuffle at any scale, and Catalyst pushes the
  * work next to the scan. That is the property that matters at 100 TB —
  * re-running a pipeline stage must select the identical subset.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from a salted md5 of the
    * id (first 8 hex chars — 32 bits, far below the Long overflow line).
    */
  def hashBucket(id: Column, salt: String, buckets: Int = 1000): Column =
    conv(substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Stratified Bernoulli sample: keep a row iff its hash bucket falls under
    * its stratum's per-mill rate. Adds the `bucket` column (kept: it is the
    * audit trail that makes the sample verifiable downstream).
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       ratesPermill: Map[String, Int], defaultPermill: Int,
                       salt: String = "sample"): DataFrame = {
    val rate = ratesPermill.foldLeft(lit(defaultPermill)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .filter(col("bucket") < rate)
  }

  /** Dataset-mixture epoch planning: each source carries a repetition
    * weight in per-mill (2500 = "see each doc 2.5× per epoch"); a doc gets
    * `floor(w)` guaranteed copies plus one more iff its hash bucket falls
    * under the fractional part — so the EXPECTED per-source document count
    * is exactly weight × |source|, decided per-row with no shuffle and no
    * randomness. Weights < 1000 subsample (docs with zero copies drop
    * out); the `copy` index materializes via explode so downstream
    * shuffles/writes see the mixture the trainer will read.
    */
  def mixEpochs(df: DataFrame, idCol: String, sourceCol: String,
                weightsPermill: Map[String, Int], defaultPermill: Int,
                salt: String = "mix"): DataFrame = {
    val wt = weightsPermill.foldLeft(lit(defaultPermill)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__wt", wt)
      .withColumn("n_copies",
        (col("__wt") / 1000).cast("long") +
          when(hashBucket(col(idCol), salt) < col("__wt") % 1000, 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
      .drop("__wt")
  }

  /** Temperature-scaled (alpha = 0.5) per-source mixture weights in
    * per-mill, from per-source document counts: share_s ∝ n_s^0.5
    * renormalized, weight_s = share_s · N / n_s. EXACT integer arithmetic
    * end to end — root-permill = floor(sqrt(n)·1000) (IEEE sqrt of an
    * integer is engine-identical), then the half-up integer division
    * (2a + b) div (2b) — so Spark and any SQL oracle derive bit-equal
    * weights. Driver-side over the (tiny) source-count map; feed the
    * result to [[mixEpochs]].
    */
  def temperatureWeightsSqrt(counts: Map[String, Long]): Map[String, Int] = {
    val bigN = counts.values.sum
    val roots = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1000).toLong
    }
    val ssum = roots.values.sum
    counts.map { case (s, n) =>
      // BigInt intermediates: 2·root·N·1000 crosses Long.MaxValue around
      // 3e8 total docs — exactly the corpus scale this derivation targets
      // (the oracle mirrors with HUGEINT); the quotient is a per-mill
      // weight and always fits
      val a = BigInt(2) * roots(s) * bigN * 1000
      val b = BigInt(2) * n * ssum
      val w = (a + b / 2) / b
      // fail loudly rather than wrap: a per-mill weight beyond Int range
      // means pathological skew (one giant source + singletons at >>3e8
      // docs) and the caller must rescale, not receive a truncated weight
      require(w.isValidInt,
        s"temperature weight for source '$s' out of Int range ($w); rescale inputs")
      s -> w.toInt
    }
  }

  /** Importance-weighted Bernoulli sample: P(keep) = min(weight, cap)/cap,
    * decided by comparing a salted hash bucket in [0, cap) against the
    * clamped integer weight — the "quality-weighted subsample" pass (keep
    * good documents outright, thin the tail proportionally). Pure integer
    * comparison end to end: no float thresholds for engines to disagree
    * over, reproducible under task retry, still one scan-side filter.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     cap: Int, salt: String = "wsample"): DataFrame =
    df.withColumn("wbucket", hashBucket(col(idCol), salt, cap))
      .filter(col("wbucket") < least(col(weightCol), lit(cap.toLong)))

  /** Deterministic train/val/test assignment on an independent salt (so the
    * split is uncorrelated with any sampling decision on the same ids).
    */
  def assignSplit(df: DataFrame, idCol: String, trainPermill: Int = 800,
                  valPermill: Int = 100, salt: String = "split"): DataFrame = {
    val b = hashBucket(col(idCol), salt)
    df.withColumn("split",
      when(b < trainPermill, "train")
        .when(b < trainPermill + valPermill, "val")
        .otherwise("test"))
  }

  /** DSIR importance scores (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score each document by the
    * log-likelihood ratio of its hashed word-bigram features under the
    * TARGET distribution (rows where `targetCol` is true — e.g. a trusted
    * high-quality subset) vs the RAW distribution (all rows), with add-one
    * smoothing over a `vocab`-sized hashed feature space.
    *
    * Scale shape — DSIR's whole point is that it avoids training a model:
    * two linear passes over the corpus. Both n-gram distributions are
    * BOUNDED aggregates (≤ vocab rows) broadcast back to the feature
    * stream; the only shuffle keyed by data volume is the per-(doc,
    * feature) count (map-side combined). The float sum per document runs
    * over its ≤ vocab DISTINCT features with integer multiplicities, not
    * raw occurrences — fewer terms, engine-stable to 4 dp.
    *
    * Feature hash = md5-derived (the engine-portable p08/p09 idiom), so an
    * identical distribution estimate is computable by any engine that has
    * md5 — the oracle recomputes it end to end.
    *
    * Returns (id, n_feats, score): one row per document that HAS at least
    * one bigram; callers left-join and default score 0 for the rest.
    */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
                 targetCol: String, vocab: Int = 4096): DataFrame = {
    val toks = df.select(col(idCol).as("id"), col(targetCol).as("is_target"),
      TextOps.tokens(lower(col(textCol))).as("ts"))
    val bi = toks.select(col("id"), col("is_target"),
      explode(when(size(col("ts")) >= 2,
        expr("transform(sequence(1, size(ts) - 1), " +
          "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"))
        .otherwise(array().cast("array<string>"))).as("bg"))
      .select(col("id"), col("is_target"),
        pmod(conv(substring(md5(col("bg")), 1, 15), 16, 10).cast("long"),
          lit(vocab.toLong)).as("h"))
    // feature-space distributions: ≤ vocab rows each, broadcastable at any
    // corpus size — this is the "estimate the importance weights" pass
    val counts = bi.groupBy(col("h"))
      .agg(count(lit(1)).as("nr"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("nt"))
    val totals = bi.agg(count(lit(1)).as("r"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t"))
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("h"),
        (log((col("nt") + 1).cast("double") / (col("t") + lit(vocab.toLong))) -
          log((col("nr") + 1).cast("double") / (col("r") + lit(vocab.toLong))))
          .as("lrv"))
    // the "score every document" pass: integer per-(doc, feature) counts,
    // then one broadcast join against the weight table
    bi.groupBy(col("id"), col("h")).agg(count(lit(1)).as("n"))
      .join(broadcast(lr), "h")
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * col("lrv")).as("score"))
  }
}
