package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus maintenance: keyed upsert/merge (the MERGE INTO
  * shape Spark's batch API lacks) and delete propagation through a corpus
  * and its derived artifacts.
  *
  * A standing training corpus is refreshed, not rebuilt: each re-crawl
  * delivers a DELTA of inserts, updates, and tombstones that must merge
  * into the corpus by key with latest-version-wins semantics, and legal
  * removal requests must propagate through every derived artifact (chunk
  * tables, indexes) — not just the corpus itself.
  *
  * Scale design (100 TB): [[merge]] is ONE full-outer join co-partitioned
  * on the key — both sides shuffle once, and a base laid out bucketed by
  * key (ops.Layout) skips its Exchange entirely, so a daily delta merge
  * costs one delta-sized shuffle against an in-place base. Delete
  * propagation shuffles nothing corpus-scale: the delete list and its
  * digest expansion are request-scale and broadcast into anti-joins that
  * ride each artifact's scan.
  */
object Incremental {

  /** Latest-wins keyed merge of a delta into a base corpus.
    *
    * Per key, the higher `versionCol` wins and delta wins version ties; a
    * winning delta row with `tombstoneCol` true removes the key. Rows keep
    * the winner's payload. Returns one row per key seen on EITHER side
    * with an `action` audit column:
    *
    *  - `insert`    — delta key absent from base
    *  - `update`    — delta won and changed at least one payload column
    *  - `unchanged` — delta won with an identical payload
    *  - `delete`    — a winning tombstone removed a base key
    *  - `noop_delete` — a tombstone for a key the base never had
    *  - `stale_skip` — the delta lost (its version is older than base's)
    *  - `carry`     — base key untouched by the delta
    *
    * The merged corpus is `action NOT IN ('delete','noop_delete')`; the
    * audit exists so an ingest run can assert its expected effect counts
    * before committing the swap.
    */
  def merge(base: DataFrame, delta: DataFrame, keyCol: String,
            versionCol: String, tombstoneCol: String,
            payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "merge needs at least one payload column")
    val k = col(keyCol)
    def pay(df: DataFrame, prefix: String) =
      payloadCols.foldLeft(df) { (d, c) => d.withColumnRenamed(c, s"$prefix$c") }
    val b = pay(base.select((keyCol +: versionCol +: payloadCols).map(col): _*), "b_")
      .withColumnRenamed(versionCol, "b_version")
    val d = pay(delta.select(
        (keyCol +: versionCol +: tombstoneCol +: payloadCols).map(col): _*), "d_")
      .withColumnRenamed(versionCol, "d_version")
      .withColumnRenamed(tombstoneCol, "d_tomb")
    val j = b.join(d, Seq(keyCol), "full_outer")
    val deltaWins = col("b_version").isNull ||
      (col("d_version") >= col("b_version"))
    val samePayload = payloadCols
      .map(c => col(s"b_$c") <=> col(s"d_$c"))
      .reduce(_ && _)
    val action = when(col("d_version").isNull, lit("carry"))
      .when(!deltaWins, lit("stale_skip"))
      .when(col("d_tomb") && col("b_version").isNull, lit("noop_delete"))
      .when(col("d_tomb"), lit("delete"))
      .when(col("b_version").isNull, lit("insert"))
      .when(samePayload, lit("unchanged"))
      .otherwise(lit("update"))
    val winnerIsDelta = col("d_version").isNotNull && deltaWins
    val merged = payloadCols.map { c =>
      when(winnerIsDelta, col(s"d_$c")).otherwise(col(s"b_$c")).as(c)
    }
    val version = when(winnerIsDelta, col("d_version"))
      .otherwise(col("b_version")).as(versionCol)
    j.select((k +: action.as("action") +: version +: merged): _*)
  }

  /** Expand a by-key delete request to the full purge set: every key whose
    * content digest matches a requested key's digest is purged too —
    * removal must catch the exact duplicates of the offending content, not
    * just the row the request named. Both the request and the expansion
    * are request-scale (broadcast joins); only the corpus scan is big.
    * Returns the distinct purge keys.
    */
  def expandDeletesByDigest(corpus: DataFrame, deleteKeys: DataFrame,
                            keyCol: String, digest: Column): DataFrame = {
    val withDigest = corpus.select(col(keyCol), digest.as("__digest"))
    val badDigests = withDigest
      .join(broadcast(deleteKeys.select(col(keyCol))), Seq(keyCol))
      .select(col("__digest")).distinct()
    withDigest.join(broadcast(badDigests), Seq("__digest"))
      .select(col(keyCol)).distinct()
  }

  /** Remove every row of `artifact` whose `keyCol` is in the purge set — a
    * broadcast anti-join that rides the artifact's scan (no corpus-scale
    * shuffle). One call per derived artifact.
    */
  def applyDeletes(artifact: DataFrame, purgeKeys: DataFrame,
                   keyCol: String): DataFrame =
    artifact.join(broadcast(purgeKeys.select(col(keyCol))), Seq(keyCol),
      "left_anti")

  /** Incremental view maintenance for ADDITIVE rollups: fold a delta's
    * aggregate into the standing rollup by summing every non-key column
    * — `rollup(v+1) = rollupMerge(rollup(v), agg(delta))`. This is the
    * property that makes a corpus dashboard affordable at 100 TB: each
    * refresh costs one DELTA-sized aggregation plus a rollup-sized merge
    * (the rollup has one row per key, not per doc), never a corpus
    * re-scan — and because the measures are sums of exact integers, the
    * incremental result is BIT-EQUAL to the full recompute, which the
    * p123 witness gates. Both inputs must share the (keys ++ measures)
    * schema.
    */
  def rollupMerge(prev: DataFrame, deltaAgg: DataFrame,
                  keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "rollupMerge needs at least one key column")
    val measures = prev.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "rollupMerge needs at least one measure")
    prev.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }
}
