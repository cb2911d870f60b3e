package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the last step before tokens hit a trainer: pack
  * documents into fixed-capacity training sequences (greedy first-fit in
  * stable doc order), so short documents share a context window instead
  * of wasting pad tokens. The assignment is the training-data layout
  * artifact: (doc → sequence, offset) must be deterministic across
  * engines and retries because a re-run must reproduce the same batches.
  *
  * Packing is an inherently SEQUENTIAL fold over its input order — the
  * parallelism unit is the SHARD (the p59 shard-manifest grain): each
  * shard's docs pack independently, in doc-id order, into that shard's
  * sequence stream. At 100 TB that is thousands of independent folds,
  * one per shard, each riding a partition-local sorted iterator — one
  * hash exchange on the shard key, a within-partition sort, zero
  * windows, zero driver state.
  *
  * Greedy rule (exact, both engines): docs in doc-id order; an incoming
  * doc whose (capacity-truncated) token count no longer fits the open
  * sequence closes it and opens the next; equal-fit stays. Oversized
  * docs truncate to capacity, so every doc occupies one sequence slice.
  */
object Packing {

  /** Pack each shard's docs into capacity-bounded sequences. Input
    * columns: `shardCol`, `idCol`, `ntokCol` (pre-truncation token
    * count). Output: (doc_id, shard, seq_id 1-based per shard, offset
    * in sequence, ntok post-truncation).
    */
  def packSequences(df: DataFrame, idCol: String, ntokCol: String,
                    shardCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity must be positive")
    val s = df.sparkSession
    import s.implicits._
    val base = df.select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        least(col(ntokCol).cast("long"), lit(capacity.toLong)).as("ntok"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    base.as[(Long, Long, Long)].mapPartitions { it =>
      var curShard = Long.MinValue
      var seq = 0L
      var fill = 0L
      it.map { case (shard, id, ntok) =>
        if (shard != curShard || seq == 0L) { curShard = shard; seq = 1L; fill = 0L }
        if (fill + ntok > capacity) { seq += 1; fill = 0L }
        val off = fill
        fill += ntok
        (id, shard, seq, off, ntok)
      }
    }.toDF("doc_id", "shard", "seq_id", "offset", "ntok")
  }
}
