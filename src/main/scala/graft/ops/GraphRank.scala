package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation.
  *
  * Web-corpus pipelines (CCNet, RefinedWeb, the Common Crawl host-level
  * ranks) weight documents by the PageRank of their host in the crawl's
  * link graph — a cheap, model-free quality prior that survives at
  * 100 TB because it touches only the (host, host) edge list, never the
  * documents. This is that operator: power-iteration PageRank over an
  * edge DataFrame, with the two properties a distributed, oracle-gated
  * implementation needs:
  *
  *  - '''Exact integer mass.''' Ranks are carried as BIGINT "pico-rank"
  *    units (total mass = 1e12). Every per-edge contribution is rounded
  *    to a unit BEFORE summation, so partial aggregation order —
  *    the thing a distributed shuffle cannot pin — can never change a
  *    result bit. The same recipe as the BM25 micro-unit scores: IEEE
  *    double ops on identical operands are engine-identical, and integer
  *    sums are order-independent.
  *  - '''Scalars stay in the plan.''' The node count, the per-iteration
  *    dangling mass and the teleport base are 1-row aggregates
  *    cross-joined (broadcast) onto the rank table — no driver-side
  *    floating point that a SQL oracle couldn't mirror operation-for-
  *    operation.
  *
  * Per iteration the plan is: ranks ⋈ edges on src (shuffle keyed by
  * src), groupBy dst (shuffle keyed by dst), plus two O(1)-row
  * broadcasts. State after each iteration is one row per NODE — cut
  * from its lineage with an eager localCheckpoint so the 8-iteration
  * plan never compounds (the standard iterative-algorithm hygiene, same
  * as the label-propagation clustering in [[Dedup]]).
  *
  * Dangling nodes (no out-edges) redistribute their damped mass
  * uniformly — the classic correction; dropping it leaks mass every
  * iteration and under-ranks everything reachable only from sinks.
  */
object GraphRank {

  /** Total integer mass: 1.0 of probability = 1e12 pico-rank units.
    * Large enough that the final ranks keep ~7 significant digits over
    * a 1e5-host graph; small enough that sums stay far inside Long
    * (1e12 total, exactly representable as a double for the divisions).
    */
  val Scale: Double = 1e12

  /** PageRank by `iters` rounds of power iteration.
    *
    * @param nodes one column `node` (LongType) — the full node universe,
    *              including pure sinks that never appear as an edge
    *              source.
    * @param edges columns `srcCol`, `dstCol` (LongType), pre-deduplicated
    *              (parallel edges count once), self-loops allowed but
    *              conventionally removed by the caller.
    * @param damping classic 0.85.
    * @return (node, out_deg, rank_units, rank) — `rank_units` the exact
    *         BIGINT result, `rank` = round(units / 1e12, 8) for human
    *         consumption.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, srcCol: String,
               dstCol: String, iters: Int = 8,
               damping: Double = 0.85): DataFrame = {
    val spark = nodes.sparkSession
    val nodeDf = nodes.select(col("node").cast("long").as("node"))
      .localCheckpoint(true)
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v")).localCheckpoint(true)
    val deg = e.groupBy("u").agg(count(lit(1)).cast("long").as("deg"))

    // 1-row scalar: node count. Stays a DataFrame so every formula that
    // uses it is the same SQL the oracle runs.
    val nn = nodeDf.agg(count(lit(1)).cast("long").as("n"))

    // teleport base per node: round((1-d) * Scale / n) — computed in-plan
    val base = nn.select(
      round(lit(1.0 - damping) * lit(Scale) / col("n")).cast("long").as("base"),
      col("n"))

    // r0: uniform round(Scale / n)
    var ranks = nodeDf.crossJoin(broadcast(nn))
      .select(col("node"), round(lit(Scale) / col("n")).cast("long").as("r"))
      .localCheckpoint(true)

    val unitContrib: Column =
      round(lit(damping) * col("r").cast("double") / col("deg")).cast("long")

    for (_ <- 1 to iters) {
      // damped, unit-rounded contribution along every edge; sum per dst
      val contrib = e.join(ranks, e("u") === ranks("node"))
        .join(deg, Seq("u"))
        .select(e("v").as("node"), unitContrib.as("c"))
        .groupBy("node").agg(sum(col("c")).cast("long").as("cs"))
      // dangling mass: ranks of nodes with no out-edge, redistributed
      val dangling = ranks.join(deg, ranks("node") === deg("u"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).cast("long").as("dmass"))
      val scalars = broadcast(base.crossJoin(dangling).select(
        col("base"),
        round(lit(damping) * col("dmass").cast("double") / col("n"))
          .cast("long").as("dshare")))
      ranks = nodeDf.join(contrib, Seq("node"), "left")
        .crossJoin(scalars)
        .select(col("node"),
          (col("base") + col("dshare") + coalesce(col("cs"), lit(0L)))
            .cast("long").as("r"))
        .localCheckpoint(true)
    }

    ranks.join(deg, ranks("node") === deg("u"), "left")
      .select(col("node"),
        coalesce(col("deg"), lit(0L)).as("out_deg"),
        col("r").as("rank_units"),
        round(col("r").cast("double") / lit(Scale), 8).as("rank"))
  }
}
