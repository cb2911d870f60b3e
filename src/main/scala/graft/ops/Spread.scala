package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for CPU-heavy per-row stages (guide §2.5 "input
  * skew: one huge unsplittable file → repartition immediately after the
  * read"): a small corpus often arrives as ONE parquet file with one row
  * group, so Spark plans a single-partition scan and an expensive per-row
  * kernel (decoders, extractors, shingle/trigram streams) runs on one core
  * of a 32-core box — the r13 profiler measured p48's three trigram stages
  * and p138's whole extraction stage as single-task.
  *
  * [[cpu]] repartitions ONLY when the planned scan parallelism is below the
  * session's core count. At deployment scale, file splits already spread
  * the scan wider than the core count, so the repartition (a full shuffle
  * of the input — wrong at 100 TB) vanishes from the plan; the probe makes
  * the choice scale-adaptive rather than constant.
  *
  * Call on SCAN-SHAPED inputs only (table read + per-row projections): the
  * partition probe plans the physical tree, which for exchange-bearing
  * plans under AQE would materialize upstream stages.
  */
object Spread {
  def cpu(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    val cur =
      try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => par }
    if (cur < par) df.repartition(par) else df
  }
}
