package graft

import graft.ops.{GraphRank, Stats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphRankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  /** tiny hand-checkable graph: 0→1, 0→2, 1→2, 3 dangling, 2→0 */
  private def tinyGraph() = {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("u", "v")
    (nodes, edges)
  }

  test("pagerank conserves mass to within n rounding units") {
    val (nodes, edges) = tinyGraph()
    val pr = GraphRank.pageRank(nodes, edges, "u", "v", iters = 8)
    val total = pr.agg(sum("rank_units")).head.getLong(0)
    // each of the n nodes contributes at most 1 unit of rounding error per
    // rounded term (base, dangling share, per-edge contribs): stay within
    // a loose 100-unit band of the 1e12 total on a 4-node graph
    assert(math.abs(total - 1_000_000_000_000L) < 100L,
      s"mass drifted: $total")
  }

  test("pagerank ranks a hub above a leaf; dangling node gets only base+share") {
    val (nodes, edges) = tinyGraph()
    val pr = GraphRank.pageRank(nodes, edges, "u", "v", iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // node 2 has two in-links (from 0 and 1); node 3 has none and no
    // out-links — the strict ordering any correct PageRank must produce
    assert(pr(2L) > pr(0L) && pr(0L) > pr(3L))
    assert(pr(1L) > pr(3L))
  }

  test("pagerank is invariant to input partitioning (exact integer units)") {
    val (nodes, edges) = tinyGraph()
    val a = GraphRank.pageRank(nodes, edges, "u", "v", iters = 6)
      .orderBy("node").collect()
    val b = GraphRank.pageRank(nodes.repartition(7), edges.repartition(5),
        "u", "v", iters = 6)
      .orderBy("node").collect()
    assert(a.sameElements(b))
  }

  test("pagerank handles the all-dangling graph (pure teleport fixpoint)") {
    import spark.implicits._
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val edges = Seq.empty[(Long, Long)].toDF("u", "v")
    val pr = GraphRank.pageRank(nodes, edges, "u", "v", iters = 4)
      .collect()
    // uniform by symmetry, out_deg 0 everywhere
    assert(pr.map(_.getLong(2)).distinct.length == 1)
    assert(pr.forall(_.getLong(1) == 0L))
  }

  test("exactQuantiles matches the sorted-array discrete quantile") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      val key = if (i % 3 == 0) "a" else "b"
      (key, rnd.nextInt(40).toLong)
    }
    val got = Stats.exactQuantiles(rows.toDF("k", "v"), "k", "v",
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def disc(vs: Seq[Long], q: Double): Long = {
      val sorted = vs.sorted
      sorted((math.ceil(q * vs.size) - 1).toInt.max(0))
    }
    for (k <- Seq("a", "b")) {
      val vs = rows.filter(_._1 == k).map(_._2)
      assert(got(k) == ((disc(vs, 0.5), disc(vs, 0.9), disc(vs, 0.99))),
        s"key $k: got ${got(k)}")
    }
  }

  test("exactQuantiles is safe for caller columns named like its internals") {
    import spark.implicits._
    // a key literally named `n` (or v/cnt/cum) must not collide with the
    // operator's working columns — and the output schema must stay
    // duplicate-free (count column becomes n_rows for an n-named key)
    val df = Seq(("n1", 3L), ("n1", 7L), ("n2", 5L)).toDF("n", "v")
    val out = Stats.exactQuantiles(df, "n", "v", Seq("p50" -> 0.5))
    assert(out.columns.toSeq == Seq("n", "n_rows", "p50", "min_v", "max_v"))
    assert(out.columns.distinct.length == out.columns.length)
    val r = out.orderBy("n")
      .select(col("n"), col("n_rows"), col("p50")).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("n1", 2L, 3L), ("n2", 1L, 5L)))
  }

  test("exactQuantiles hits exact boundary values (q=1.0 is the max)") {
    import spark.implicits._
    val df = Seq.tabulate(10)(i => ("k", (i + 1).toLong)).toDF("k", "v")
    val r = Stats.exactQuantiles(df, "k", "v",
        Seq("p50" -> 0.5, "p100" -> 1.0)).head
    assert(r.getLong(2) == 5L)   // ceil(0.5*10)=5 → 5th smallest of 1..10
    assert(r.getLong(3) == 10L)  // q=1 → max
    assert(r.getLong(4) == 1L && r.getLong(5) == 10L)
  }
}
