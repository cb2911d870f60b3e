package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's own bloom-filter expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` power Spark's internal
  * runtime-filter rewrite (InjectRuntimeFilter) but are not registered as
  * user functions. Registered, they make the broadcast-bloom blocklist
  * prune writable as SQL:
  *
  * {{{
  * SELECT * FROM corpus
  * WHERE NOT might_contain(
  *   (SELECT bloom_filter_agg(xxhash64(digest), 10000, 65536) FROM blocklist),
  *   xxhash64(digest))
  * }}}
  *
  * might_contain's type check restricts the bloom argument to a literal or
  * scalar subquery, so the aggregate is evaluated once and ships to
  * executors as a broadcast value — the corpus side stays a per-row scan
  * filter with NO shuffle. Bloom "maybe" hits still need an exact residual
  * check (false positives); "no" is definitive (no false negatives). That
  * split — definite-clean kept scan-side, candidates exact-joined — is the
  * 100 TB blocklist-dedup shape (see queries.Pipeline p35).
  *
  * GraftExtensions injects both for zero-code installs; this helper covers
  * plain sessions.
  */
object BloomSql {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg", exprs => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"bloom_filter_agg expects (value, estimatedItems, numBits), got ${exprs.length} args")
        BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"might_contain expects (bloom, value), got ${exprs.length} args")
        BloomFilterMightContain(exprs(0), exprs(1))
      }, "built-in")
  }
}
