package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational surface the reference workload delegates to its host engine
  * (SURVEY §2B): every construct its docs/examples/tests execute, expressed
  * Spark-first and validated against a DuckDB oracle.
  *
  * Conventions for oracle parity: every aggregate/computed column is aliased
  * identically on both sides; doubles that aggregate across partitions are
  * rounded to 4 decimals (partial-aggregation order differs between engines);
  * every query has a total deterministic ORDER BY; DuckDB integer sums are
  * cast to BIGINT to match Spark's LongType.
  */
object Relational {
  import Tables.t

  def defs: Seq[QueryDef] = Seq(
    // -- projection + filter + expression (README.md:104-117 shape) --------
    QueryDef("q01_filter_project",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
            $"l_discount" > 0.05)
          .select($"l_orderkey", $"l_linenumber",
            round($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("net_price"))
          .orderBy(desc("net_price"), asc("l_orderkey"), asc("l_linenumber"))
          .limit(100)
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |round(l_extendedprice * (1.0 - l_discount), 4) AS net_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_discount > 0.05
             |ORDER BY net_price DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    // -- grouped aggregation (TPC-H Q1 shape; z_integration count(*)) ------
    QueryDef("q02_agg_pricing_summary",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
          .groupBy($"l_returnflag", $"l_linestatus")
          // price sums through the exact-cents BIGINT path (the q03/p50
          // contract): this query folds ALL of lineitem into ~4 groups, so
          // the sums are the first to cross double's 4-decimal precision as
          // data grows (quantity stays a plain double sum — integer-valued,
          // exact to 2^53; averages are magnitude-bounded)
          .agg(
            round(sum($"l_quantity"), 4).as("sum_qty"),
            round(sum(round($"l_extendedprice" * 100, 0).cast("long")) / 100.0, 4)
              .as("sum_base_price"),
            round(sum(round($"l_extendedprice" * 100, 0).cast("long") *
                (lit(100L) - round($"l_discount" * 100, 0).cast("long"))) / 1e4, 4)
              .as("sum_disc_price"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity), 4) AS sum_qty,
             |round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 4) AS sum_base_price,
             |round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
             |          (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 1e4, 4) AS sum_disc_price,
             |round(avg(l_quantity), 4) AS avg_qty,
             |round(avg(l_discount), 4) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // -- multi-way join + aggregation (broadcast the dimensions) -----------
    QueryDef("q03_join_revenue_by_segment",
      (s, d) => {
        import s.implicits._
        val c = t(s, d, "customer"); val o = t(s, d, "orders"); val l = t(s, d, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy($"c_mktsegment")
          // exact-integer revenue (the p50 contract): prices/discounts are
          // 2-decimal, so cents × (100 - discount%) is an exact BIGINT in
          // 1e-4 dollars — double summation drifts in the 4th decimal once
          // group sums pass ~1e10 (caught by the sf1.0 stress gate), and
          // BIGINT summation is also engine-order-independent
          .agg(round(sum(round($"l_extendedprice" * 100, 0).cast("long") *
              (lit(100L) - round($"l_discount" * 100, 0).cast("long"))) / 1e4, 4)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
             |          (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 1e4, 4) AS revenue,
             |count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // -- CTE + top-k ordering (README.md:145,183 shape) ---------------------
    QueryDef("q04_cte_top_suppliers",
      (s, d) => {
        import s.implicits._
        val l = t(s, d, "lineitem"); val sup = t(s, d, "supplier")
        val rev = l.groupBy($"l_suppkey")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("total_rev"))
        rev.join(broadcast(sup), rev("l_suppkey") === sup("s_suppkey"))
          .select($"s_name", $"total_rev")
          .orderBy(desc("total_rev"), asc("s_name"))
          .limit(5)
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_rev
             |  FROM lineitem GROUP BY l_suppkey)
             |SELECT s_name, total_rev FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |ORDER BY total_rev DESC, s_name LIMIT 5""".stripMargin)),

    // -- UNION ALL across branches (ITALY.md:225-229 shape) -----------------
    QueryDef("q05_union_all",
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
        val hi = o.filter($"o_totalprice" > 400000)
          .select(lit("high").as("bucket"), $"o_orderkey", round($"o_totalprice", 4).as("price"))
        val lo = o.filter($"o_totalprice" < 1000)
          .select(lit("low").as("bucket"), $"o_orderkey", round($"o_totalprice", 4).as("price"))
        hi.unionByName(lo).orderBy($"bucket", $"o_orderkey")
      },
      Some("""SELECT * FROM (
             |  SELECT 'high' AS bucket, o_orderkey, round(o_totalprice, 4) AS price
             |  FROM orders WHERE o_totalprice > 400000
             |  UNION ALL
             |  SELECT 'low' AS bucket, o_orderkey, round(o_totalprice, 4) AS price
             |  FROM orders WHERE o_totalprice < 1000)
             |ORDER BY bucket, o_orderkey""".stripMargin)),

    // -- CASE WHEN bucketing (ITALY.md:187-199 shape) -----------------------
    QueryDef("q06_case_when",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .select($"o_orderkey",
            when($"o_totalprice" > 300000, "large")
              .when($"o_totalprice" > 100000, "medium")
              .otherwise("small").as("size_class"))
          .groupBy($"size_class").agg(count(lit(1)).as("n"))
          .orderBy($"size_class")
      },
      Some("""SELECT CASE WHEN o_totalprice > 300000 THEN 'large'
             |WHEN o_totalprice > 100000 THEN 'medium' ELSE 'small' END AS size_class,
             |count(*) AS n FROM orders GROUP BY 1 ORDER BY size_class""".stripMargin)),

    // -- scalar subquery (README.md:282 shape) ------------------------------
    QueryDef("q07_scalar_subquery",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("g_orders")
        s.sql("""SELECT o_orderkey, round(o_totalprice, 4) AS price
                |FROM g_orders
                |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM g_orders)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, round(o_totalprice, 4) AS price FROM orders
             |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
             |ORDER BY o_orderkey""".stripMargin)),

    // -- semi/anti joins (EXISTS / NOT EXISTS) ------------------------------
    QueryDef("q08_anti_join",
      (s, d) => {
        import s.implicits._
        val c = t(s, d, "customer")
        val big = t(s, d, "orders").filter($"o_totalprice" > 400000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name").orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    // -- window functions (free from Catalyst; SURVEY §2B "not present in
    //    reference" set, validated here anyway) -----------------------------
    QueryDef("q09_window_topn",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey").orderBy(desc("net"), asc("l_orderkey"), asc("l_linenumber"))
        t(s, d, "lineitem")
          .withColumn("net", round($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"l_suppkey", $"rn", $"l_orderkey", $"net")
          .orderBy($"l_suppkey", $"rn")
      },
      Some("""SELECT l_suppkey, rn, l_orderkey, net FROM (
             |  SELECT l_suppkey, l_orderkey,
             |    round(l_extendedprice * (1.0 - l_discount), 4) AS net,
             |    row_number() OVER (PARTITION BY l_suppkey
             |      ORDER BY round(l_extendedprice * (1.0 - l_discount), 4) DESC,
             |               l_orderkey, l_linenumber) AS rn
             |  FROM lineitem) WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin)),

    // -- ROLLUP (grouping sets) ---------------------------------------------
    QueryDef("q10_rollup",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(round(sum($"l_quantity"), 4).as("sum_qty"))
          .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
            coalesce($"l_linestatus", lit("ALL")).as("ls"), $"sum_qty")
          .orderBy($"rf", $"ls")
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |coalesce(l_linestatus, 'ALL') AS ls,
             |round(sum(l_quantity), 4) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // -- CUBE grouping sets --------------------------------------------------
    QueryDef("q19_cube",
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          // exact-cents BIGINT sum (see q03): the grand-total cube cell
          // crosses 7e10 at the 10× stress, where double-sum order costs
          // the 4th decimal
          .agg(count(lit(1)).as("n"),
            round(sum(round($"o_totalprice" * 100, 0).cast("long")) / 100.0, 4).as("total"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"), $"n", $"total")
          .orderBy($"status", $"priority")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |coalesce(o_orderpriority, 'ALL') AS priority,
             |count(*) AS n,
             |round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS total
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // -- EXCEPT set op -------------------------------------------------------
    QueryDef("q20_except",
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
        val all = o.filter($"o_totalprice" > 100000).select($"o_custkey")
        val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        all.except(urgent).orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 100000
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_custkey""".stripMargin)),

    // -- INTERSECT/EXCEPT set ops -------------------------------------------
    QueryDef("q11_set_ops",
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
        val buyers = o.filter($"o_totalprice" > 200000).select($"o_custkey")
        val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        buyers.intersect(urgent).orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 200000
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_custkey""".stripMargin)),

    // -- VALUES inline table + join (README.md:263-276 CREATE..VALUES shape)
    QueryDef("q12_values_join",
      (s, d) => {
        import s.implicits._
        val segs = Seq(("BUILDING", 1), ("MACHINERY", 2), ("AUTOMOBILE", 3))
          .toDF("seg_name", "seg_rank")
        t(s, d, "customer")
          .join(broadcast(segs), $"c_mktsegment" === $"seg_name")
          .groupBy($"seg_name", $"seg_rank").agg(count(lit(1)).as("n_customers"))
          .orderBy($"seg_rank")
      },
      Some("""SELECT seg_name, seg_rank, count(*) AS n_customers
             |FROM customer
             |JOIN (VALUES ('BUILDING', 1), ('MACHINERY', 2), ('AUTOMOBILE', 3))
             |  AS segs(seg_name, seg_rank) ON c_mktsegment = seg_name
             |GROUP BY seg_name, seg_rank ORDER BY seg_rank""".stripMargin)),

    // -- JSON extraction (examples/monaco_pure_sql.sql:93-107 shape) --------
    QueryDef("q13_json_extract",
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .select($"event_id", get_json_object($"props", "$.k").cast("int").as("k"))
          .filter($"k" > 90)
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
             |FROM events WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
             |ORDER BY event_id""".stripMargin)),

    // -- time bucketing on the events stream table --------------------------
    QueryDef("q14_events_hourly",
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .groupBy(date_trunc("hour", $"ts").as("hour_ts"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
          .orderBy($"hour_ts", $"event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
             |count(*) AS n, round(sum(value), 4) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin)),

    // -- sessionization: gap > 30 min starts a new session (lag + cumsum) ---
    // Gap predicate at µs precision (mirrors the passing s02 form) and the
    // value sum over an exact DECIMAL so both engines aggregate
    // order-independently — DOUBLE partial-sum order differs between
    // engines and can flip round(.,4) at a boundary.
    QueryDef("q15_sessionize",
      (s, d) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        t(s, d, "events")
          .withColumn("prev_ts", lag($"ts", 1).over(byUser))
          .withColumn("new_session",
            when($"prev_ts".isNull ||
              unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id", sum($"new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
            round(sum($"value".cast("decimal(30,10)")), 4).cast("double")
              .as("session_value"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, value,
             |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM marked)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  count(*) AS n_events,
             |  CAST(round(sum(CAST(value AS DECIMAL(30,10))), 4) AS DOUBLE) AS session_value
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // -- correlated lateral join (README.md:280, ITALY.md:113 shape) --------
    QueryDef("q16_lateral",
      (s, d) => {
        t(s, d, "nation").createOrReplaceTempView("g_nation")
        t(s, d, "region").createOrReplaceTempView("g_region")
        s.sql("""SELECT r_name, n_name FROM g_region,
                |LATERAL (SELECT n_name FROM g_nation
                |         WHERE n_regionkey = r_regionkey
                |         ORDER BY n_name LIMIT 2)
                |ORDER BY r_name, n_name""".stripMargin)
      },
      Some("""SELECT r_name, n_name FROM region,
             |LATERAL (SELECT n_name FROM nation
             |         WHERE n_regionkey = r_regionkey
             |         ORDER BY n_name LIMIT 2) AS t
             |ORDER BY r_name, n_name""".stripMargin)),

    // -- distinct + approx aggregates --------------------------------------
    QueryDef("q17_distinct_counts",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .groupBy($"l_returnflag")
          .agg(countDistinct($"l_partkey").as("n_parts"),
            countDistinct($"l_suppkey").as("n_supps"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // -- struct construction + field access (monaco_routing.test:23 shape) --
    QueryDef("q18_struct_access",
      (s, d) => {
        import s.implicits._
        t(s, d, "part")
          .select($"p_partkey",
            struct($"p_brand".as("brand"), round($"p_retailprice", 4).as("price")).as("info"))
          .select($"p_partkey", $"info.brand".as("brand"), $"info.price".as("price"))
          .filter($"price" > 910)
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, info.brand AS brand, info.price AS price FROM (
             |  SELECT p_partkey, {'brand': p_brand, 'price': round(p_retailprice, 4)} AS info
             |  FROM part) t
             |WHERE info.price > 910 ORDER BY p_partkey""".stripMargin)),

    // -- ASOF JOIN (DuckDB-native operator; graft.ops.Joins.asofJoin) -------
    // Each event picks up the user's most recent order at-or-before the
    // event: one shuffle on the key + running last() — no per-key blowup.
    // The right side is pre-aggregated to one row per (custkey, orderdate)
    // because ASOF tie-breaks among equal timestamps are unspecified.
    QueryDef("q21_asof_join",
      (s, d) => {
        import s.implicits._
        val orders = t(s, d, "orders")
          .groupBy($"o_custkey", $"o_orderdate")
          .agg(max($"o_orderkey").as("o_orderkey"), max($"o_totalprice").as("o_totalprice"))
        val events = t(s, d, "events").select($"event_id", $"user_id", $"ts")
        graft.ops.Joins.asofJoin(events, orders,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            rightVals = Seq("o_orderkey", "o_totalprice"))
          .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
          .orderBy($"event_id")
      },
      Some("""WITH ord AS (
             |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
             |         max(o_totalprice) AS o_totalprice
             |  FROM orders GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
             |FROM events e
             |ASOF JOIN ord o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             |ORDER BY e.event_id""".stripMargin)),

    // -- range/interval join (DuckDB IEJoin; graft.ops.Joins.rangeJoin) -----
    // Price-band containment: lineitems whose extended price falls in each
    // order's band. Binned candidates + exact residual filter — candidate
    // cost is density-bounded, unlike Spark's BroadcastNestedLoopJoin
    // fallback for inequality-only predicates.
    QueryDef("q22_range_join",
      (s, d) => {
        import s.implicits._
        val bands = t(s, d, "orders")
          .select($"o_orderkey", ($"o_totalprice" / 4 - 5).as("lo"), ($"o_totalprice" / 4 + 5).as("hi"))
        val items = t(s, d, "lineitem").select($"l_extendedprice")
        graft.ops.Joins.rangeJoin(items, bands, "l_extendedprice", "lo", "hi", binWidth = 10.0)
          .groupBy($"o_orderkey")
          .agg(count(lit(1)).as("n_items"), round(sum($"l_extendedprice"), 4).as("sum_price"))
          .orderBy($"o_orderkey")
      },
      Some("""WITH iv AS (
             |  SELECT o_orderkey, o_totalprice / 4 - 5 AS lo, o_totalprice / 4 + 5 AS hi
             |  FROM orders)
             |SELECT iv.o_orderkey, count(*) AS n_items,
             |       round(sum(l.l_extendedprice), 4) AS sum_price
             |FROM iv JOIN lineitem l ON l.l_extendedprice BETWEEN iv.lo AND iv.hi
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // -- pivot (host DuckDB PIVOT; Spark relational groupBy().pivot()) ------
    // Wide-format rollup: return flag x line status quantity matrix. The
    // pivot values are DECLARED (Seq("F","O")) so the plan is a single
    // HashAggregate pass — the undeclared form schedules an extra distinct
    // job to discover them, which is the difference between one scan and
    // two at 100 TB. Oracle = the CASE-aggregation PIVOT desugars to.
    QueryDef("q23_pivot",
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .groupBy($"l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(round(sum($"l_quantity"), 2))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // -- unpivot (host DuckDB UNPIVOT; Spark Dataset.unpivot) ---------------
    // Long-format melt of the part measures. Dataset.unpivot is a pure
    // Generate (no shuffle, no join) — each input row expands to its
    // (measure, value) pairs in place, so the melt is scan-parallel.
    QueryDef("q24_unpivot",
      (s, d) => {
        import s.implicits._
        t(s, d, "part").filter($"p_partkey" <= 500)
          .select($"p_partkey", $"p_size".cast("double").as("size"),
            round($"p_retailprice", 2).as("retailprice"))
          .unpivot(Array($"p_partkey"), Array($"size", $"retailprice"),
            "measure", "value")
          .orderBy($"p_partkey", $"measure")
      },
      Some("""SELECT p_partkey, measure, value FROM (
             |  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value
             |  FROM part WHERE p_partkey <= 500
             |  UNION ALL
             |  SELECT p_partkey, 'retailprice' AS measure, round(p_retailprice, 2) AS value
             |  FROM part WHERE p_partkey <= 500)
             |ORDER BY p_partkey, measure""".stripMargin)),

    // -- explicit GROUPING SETS (beyond ROLLUP q10 / CUBE q19) --------------
    // The two one-dimensional marginals WITHOUT the grand total — the shape
    // ROLLUP/CUBE can't express. grouping_id() disambiguates which set a
    // row belongs to (NULL-valued keys are ambiguous when the data itself
    // has NULLs). One Expand + one HashAggregate pass over the scan.
    QueryDef("q25_grouping_sets",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem_gs")
        s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
                |  coalesce(l_linestatus, 'ALL') AS ls,
                |  grouping_id(l_returnflag, l_linestatus) AS gid,
                |  round(sum(l_quantity), 4) AS sum_qty,
                |  count(*) AS n
                |FROM lineitem_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
                |ORDER BY gid, rf, ls""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |  coalesce(l_linestatus, 'ALL') AS ls,
             |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
             |  round(sum(l_quantity), 4) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             |ORDER BY gid, rf, ls""".stripMargin)),

    // -- value-range window frame (RANGE BETWEEN ... PRECEDING) -------------
    // Per-user trailing 30-minute activity: the frame is bounded by VALUE
    // distance on the ordering key (epoch µs), not row count — the
    // time-decayed-feature shape ROWS frames can't express. Both engines
    // share the µs ordering key, and the moving sum goes through
    // DECIMAL(30,10) so frame-internal summation order can't split hashes
    // (the q15 lesson). Partitioned by user — scales per-key.
    QueryDef("q26_range_frame",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
          .rangeBetween(-1800000000L, 0L)
        t(s, d, "events")
          .withColumn("n_30m", count(lit(1)).over(w))
          .withColumn("sum_30m",
            round(sum($"value".cast("decimal(30,10)")).over(w), 4).cast("double"))
          .select($"event_id", $"user_id", $"n_30m", $"sum_30m")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(count(*) OVER w AS BIGINT) AS n_30m,
             |  CAST(round(sum(CAST(value AS DECIMAL(30,10))) OVER w, 4) AS DOUBLE) AS sum_30m
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // -- CSV source/sink roundtrip (host read_csv/COPY ... WITH CSV) --------
    // The host engine's workhorse ingest format: write a projection out as
    // CSV, read it back with an explicit schema (no inference job — at
    // 100 TB schema inference is a full extra scan), and aggregate. The
    // oracle aggregates the original parquet directly, so the hash-match
    // proves the CSV codec roundtrips values exactly.
    QueryDef("q27_csv_roundtrip",
      (s, d) => {
        import s.implicits._
        val dirPath = java.nio.file.Files.createTempDirectory("graft-csv")
        try {
          val dir = dirPath.toString
          t(s, d, "lineitem")
            .select($"l_orderkey", $"l_returnflag", $"l_quantity")
            .write.mode("overwrite").option("header", "true").csv(s"$dir/li")
          val back = s.read
            .schema("l_orderkey LONG, l_returnflag STRING, l_quantity DOUBLE")
            .option("header", "true").csv(s"$dir/li")
          // materialize before the finally deletes the CSV under the lazy scan
          back.groupBy($"l_returnflag")
            .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
            .orderBy($"l_returnflag")
            .localCheckpoint(true)
        } finally graft.ops.Fs.deleteRecursively(dirPath)
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // -- ranking/navigation window-function family --------------------------
    // The §2B window corners not yet exercised elsewhere: percent_rank and
    // cume_dist (exact rational values — (rank-1)/(n-1) and rank_hi/n are
    // small-integer ratios, identical doubles in both engines), lead/lag
    // with defaults, and first/nth value over an explicit frame. Total
    // deterministic ORDER BY; one window per customer partition.
    QueryDef("q28_window_funcs",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, d, "orders").filter($"o_custkey" < 200)
          .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
          .withColumn("rn", row_number().over(w))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .withColumn("prev_price", round(lag($"o_totalprice", 1, 0.0).over(w), 2))
          .withColumn("next_key", lead($"o_orderkey", 1, -1L).over(w))
          .withColumn("first_key", first($"o_orderkey").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select($"o_custkey", $"o_orderkey", $"rn", $"pr", $"cd",
            $"prev_price", $"next_key", $"first_key")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(row_number() OVER w AS INT) AS rn,
             |  round(percent_rank() OVER w, 6) AS pr,
             |  round(cume_dist() OVER w, 6) AS cd,
             |  round(COALESCE(lag(o_totalprice, 1) OVER w, 0.0), 2) AS prev_price,
             |  COALESCE(lead(o_orderkey, 1) OVER w, -1) AS next_key,
             |  first_value(o_orderkey) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key
             |FROM orders WHERE o_custkey < 200
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, rn""".stripMargin)),

    // -- correlated EXISTS / NOT EXISTS -------------------------------------
    // The correlated-subquery predicate form (distinct from q07's scalar
    // subquery and q08's join-operator anti join): Catalyst rewrites both
    // branches to semi/anti joins — same physical plan, the HOST-ENGINE
    // syntax a migrating user brings along.
    QueryDef("q29_exists",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders_ex")
        t(s, d, "lineitem").createOrReplaceTempView("lineitem_ex")
        s.sql("""SELECT o_orderkey, o_custkey,
                |  round(o_totalprice, 2) AS total
                |FROM orders_ex o
                |WHERE EXISTS (SELECT 1 FROM lineitem_ex l
                |              WHERE l.l_orderkey = o.o_orderkey
                |                AND l.l_extendedprice > 4000)
                |  AND NOT EXISTS (SELECT 1 FROM lineitem_ex l
                |                  WHERE l.l_orderkey = o.o_orderkey
                |                    AND l.l_discount > 0.09)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_extendedprice > 4000)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l
             |                  WHERE l.l_orderkey = o.o_orderkey
             |                    AND l.l_discount > 0.09)
             |ORDER BY o_orderkey""".stripMargin)),

    // -- QUALIFY: the host engine's window-result filter clause ------------
    // DuckDB runs QUALIFY natively; Spark lacks the clause, so graft adds it
    // (plans.Qualify: parse-time fold into the window-subquery shape —
    // injected session-wide via GraftExtensions, per-call via Qualify.sql).
    // The SAME statement text runs on both engines (only table names differ):
    // the strongest possible parity witness — the oracle is not a mirror of
    // the query, it IS the query.
    QueryDef("q30_qualify",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("g_orders30")
        t(s, d, "customer").createOrReplaceTempView("g_customer30")
        graft.plans.Qualify.sql(s, qualifyStatement("g_orders30", "g_customer30"))
      },
      Some(qualifyStatement("orders", "customer"))),

    // -- WITH RECURSIVE: recursive CTE (host engine + Spark 4 UnionLoop) ---
    // The classic gap-filling shape: a recursive week scaffold LEFT-joined
    // against per-week order aggregates so empty weeks surface as zero rows.
    // The scaffold is 61 rows — AQE broadcasts it; the recursion itself is
    // driver-trivial and the orders side stays one scan + HashAggregate.
    QueryDef("q31_recursive_cte",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("g_orders31")
        s.sql(
          """WITH RECURSIVE weeks(week) AS (
            |  SELECT 0
            |  UNION ALL
            |  SELECT week + 1 FROM weeks WHERE week < 60
            |),
            |po AS (
            |  SELECT CAST(floor(datediff(CAST(o_orderdate AS DATE),
            |                             DATE '1995-01-01') / 7.0) AS INT) AS week,
            |         o_orderkey, o_totalprice
            |  FROM g_orders31
            |  WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
            |    AND CAST(o_orderdate AS DATE) < DATE '1996-03-01'
            |)
            |SELECT w.week, CAST(count(po.o_orderkey) AS BIGINT) AS n_orders,
            |       round(coalesce(sum(po.o_totalprice), 0), 2) AS revenue
            |FROM weeks w LEFT JOIN po ON po.week = w.week
            |GROUP BY w.week
            |ORDER BY w.week""".stripMargin)
      },
      Some("""WITH RECURSIVE weeks(week) AS (
             |  SELECT 0
             |  UNION ALL
             |  SELECT week + 1 FROM weeks WHERE week < 60
             |),
             |po AS (
             |  SELECT CAST(floor(date_diff('day', DATE '1995-01-01',
             |                              CAST(o_orderdate AS DATE)) / 7.0) AS INT) AS week,
             |         o_orderkey, o_totalprice
             |  FROM orders
             |  WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
             |    AND CAST(o_orderdate AS DATE) < DATE '1996-03-01'
             |)
             |SELECT w.week, CAST(count(po.o_orderkey) AS BIGINT) AS n_orders,
             |       round(coalesce(sum(po.o_totalprice), 0), 2) AS revenue
             |FROM weeks w LEFT JOIN po ON po.week = w.week
             |GROUP BY w.week
             |ORDER BY w.week""".stripMargin)),

    // -- GROUP BY ALL / ORDER BY ALL ----------------------------------------
    // The host engine's signature SQL ergonomic; Spark speaks it natively
    // (grouping keys inferred as the non-aggregate select items, ordering by
    // the full output row). The oracle is the BYTE-IDENTICAL statement.
    QueryDef("q32_by_all",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(byAllStatement)
      },
      Some(byAllStatement)),

    // -- DISTINCT ON: first row per key (host/Postgres dialect) -------------
    // Spark lacks the clause; plans.Qualify folds it to the row_number
    // window form at parse time (the ORDER BY does double duty picking the
    // surviving row and ordering output, exactly the host semantics). The
    // oracle runs the IDENTICAL statement natively in DuckDB.
    QueryDef("q33_distinct_on",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        graft.plans.Qualify.sql(s, distinctOnStatement)
      },
      Some(distinctOnStatement)),

    // -- struct_pack: the host dialect's named-field struct constructor ----
    // (examples/geometry_macro.sql:31-35). Folded at parse time into
    // named_struct; the oracle runs the IDENTICAL statement natively.
    QueryDef("q34_struct_pack",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        graft.plans.Qualify.sql(s, structPackStatement)
      },
      Some(structPackStatement)),

    // -- CREATE MACRO: the host dialect's untyped SQL macro ----------------
    // (examples/geometry_macro.sql:30-36). Registered per-session and
    // inlined textually at call sites — the host's lazy-binding semantics.
    // The oracle is the macro-expanded single statement (expansion is
    // deterministic text substitution, so equality is by construction; a
    // multi-statement oracle would depend on the driver's executor).
    QueryDef("q35_create_macro",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        graft.plans.Qualify.sql(s,
          "CREATE OR REPLACE MACRO disc_price(p, d) AS p * (1 - d)")
        graft.plans.Qualify.sql(s,
          """SELECT l_returnflag,
            |       round(sum(disc_price(l_extendedprice, l_discount)), 2) AS revenue
            |FROM lineitem
            |GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin)
      },
      Some(
        """SELECT l_returnflag,
          |       round(sum((l_extendedprice) * (1 - (l_discount))), 2) AS revenue
          |FROM lineitem
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)),

    // -- host function vocabulary: len / string_split / list_* / regexp_matches
    // (functions/DuckCompat — every alias a native codegen'd expression).
    // One text, two engines: the statement leans on the aliases everywhere.
    QueryDef("q36_duck_funcs",
      (s, d) => {
        graft.functions.DuckCompat.register(s)
        t(s, d, "documents").createOrReplaceTempView("documents")
        s.sql(duckFuncsStatement)
      },
      Some(duckFuncsStatement)),

    // -- host JSON construction: json_object / json_array / json ------------
    // (functions/JsonCompat — native codegen'd expressions; the reference's
    // GeoJSON-export vocabulary, examples/monaco_pure_sql.sql:101-113). One
    // text, two engines: nested objects/arrays embed RAW (the host's JSON-
    // type semantics, tracked structurally here), and the emitted JSON text
    // must match the host's yyjson byte-for-byte — minified, minimal
    // escaping. Aggregates feed through exact-integer paths (per-row round
    // to cents, then BIGINT sum) so the payload is engine-order-independent.
    QueryDef("q37_json_export",
      (s, d) => {
        graft.functions.JsonCompat.register(s)
        t(s, d, "customer").createOrReplaceTempView("customer")
        t(s, d, "nation").createOrReplaceTempView("nation")
        graft.plans.Qualify.sql(s, jsonExportStatement)
      },
      Some(jsonExportStatement)),

    // -- host text-similarity family (functions/TextSim) --------------------
    // jaccard / hamming / jaro / jaro_winkler / damerau_levenshtein /
    // editdist3 — byte-level semantics pinned against the host, every one a
    // native codegen'd expression. One text, two engines; doubles round(6)
    // (both engines compute IEEE doubles from the same formula — rounding
    // absorbs any last-bit association-order difference).
    QueryDef("q38_text_similarity",
      (s, d) => {
        graft.functions.DuckCompat.register(s)
        t(s, d, "documents").createOrReplaceTempView("documents")
        s.sql(textSimStatement)
      },
      Some(textSimStatement)),

    // -- blocking + edit-distance verify: fuzzy key matching at scale ------
    QueryDef("q39_fuzzy_keys",
      (s, d) => {
        graft.functions.DuckCompat.register(s)
        t(s, d, "documents").createOrReplaceTempView("documents")
        s.sql(fuzzyKeysStatement)
      },
      Some(fuzzyKeysStatement)),

    // -- ORC source/sink roundtrip ------------------------------------------
    // The remaining built-in columnar format (q27 covers CSV; parquet IS the
    // input surface): write a pruned orders projection as ORC, read it back,
    // and aggregate through the exact-cents contract. Exercises Spark's
    // native ORC reader/writer including predicate pushdown on the re-read
    // (the filter reaches the OrcScan).
    QueryDef("q40_orc_roundtrip",
      (s, d) => {
        import s.implicits._
        val dirPath = java.nio.file.Files.createTempDirectory("graft-orc")
        try {
          val dir = dirPath.toString
          t(s, d, "orders")
            .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
            .write.mode("overwrite").orc(s"$dir/ord")
          val back = s.read.orc(s"$dir/ord")
          back.filter($"o_orderkey" < 30000)
            .groupBy($"o_orderpriority")
            .agg(count(lit(1)).as("n"),
              sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
                .as("price_cents"))
            .orderBy($"o_orderpriority")
            .localCheckpoint(true)
        } finally graft.ops.Fs.deleteRecursively(dirPath)
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS price_cents
             |FROM orders WHERE o_orderkey < 30000
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // -- VariantType JSON processing ----------------------------------------
    // Spark 4's semi-structured path: parse_json materializes the binary
    // VARIANT encoding once, variant_get then extracts typed fields
    // without re-parsing text per access — at 100 TB the difference
    // between one parse and one parse PER extraction, and the layout
    // shredded columnar JSON storage builds on. Exact-cents sum contract
    // (q02 discipline) keeps the double aggregate engine-exact.
    QueryDef("q41_variant_json",
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .select($"event_id", $"value", parse_json($"props").as("v"))
          // floor-consistent bucketing (ADVICE r4): Spark `div` truncates
          // toward zero while DuckDB `//` floors, so a negative k would
          // silently diverge — floor() on both sides closes the latent gap
          .groupBy(floor(expr("variant_get(v, '$.k', 'int')") / 10.0)
            .cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(sum(round($"value" * 100).cast("long")) / 100.0, 2).as("sum_value"))
          .orderBy($"bucket")
      },
      // NULLS FIRST pins DuckDB to Spark's ascending default for a
      // missing/null $.k (DuckDB defaults NULLS LAST)
      Some("""SELECT
             |  CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10.0) AS BIGINT)
             |    AS bucket,
             |  CAST(count(*) AS BIGINT) AS n,
             |  round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
             |    AS sum_value
             |FROM events GROUP BY bucket ORDER BY bucket NULLS FIRST""".stripMargin)),

    // -- hive-partitioned layout: write partitionBy, read partition-pruned --
    // The directory-partitioning half of the layout story (p50 covers
    // bucketing, p25 z-ordering): a `partitionBy(status)` write puts each
    // status in its own directory, and a status-filtered read back never
    // opens the other directories — the plan's PartitionFilters prune at
    // FILE level before any row is read (PlanSpec asserts it). At 100 TB
    // this is the difference between scanning one date/status slice and
    // scanning the table; values go through the exact-cents contract so
    // the layout can only change cost, never the answer.
    QueryDef("q42_partitioned_prune",
      (s, d) => {
        import s.implicits._
        val dirPath = java.nio.file.Files.createTempDirectory("graft-hivepart")
        try {
          val dir = dirPath.toString
          t(s, d, "orders")
            .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
              $"o_orderstatus")
            .write.mode("overwrite").partitionBy("o_orderstatus")
            .parquet(s"$dir/ord")
          s.read.parquet(s"$dir/ord")
            .filter($"o_orderstatus" === "F")
            .groupBy($"o_orderpriority")
            .agg(count(lit(1)).as("n"),
              sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
                .as("price_cents"))
            .orderBy($"o_orderpriority")
            .localCheckpoint(true)
        } finally graft.ops.Fs.deleteRecursively(dirPath)
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS price_cents
             |FROM orders WHERE o_orderstatus = 'F'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // -- SCD2 point-in-time dimension join -----------------------------------
    // The slowly-changing-dimension shape every warehouse fact pipeline
    // needs: facts join the dimension row whose validity interval
    // [valid_from, valid_to) contains the fact's event time. The fixture
    // derives a two-version dimension per user from the event-time span
    // (split at the integer-µs midpoint, so single-event users land in
    // the open-ended second version); the join is an equi-join on the key
    // with range predicates riding as join conditions — per-key dimension
    // versions are bounded, so this scales as an ordinary keyed join, not
    // an interval product. Value sums run over exact DECIMAL (the q15
    // contract: DOUBLE partial-sum order differs between engines).
    QueryDef("q43_scd2_join",
      (s, d) => {
        import s.implicits._
        val ev = t(s, d, "events").where($"user_id" < 50)
          .select($"user_id", unix_micros($"ts").as("us"), $"value")
        val span = ev.groupBy($"user_id").agg(
          min($"us").as("t0"), max($"us").as("t2"))
        val mid = expr("(t0 + t2) DIV 2")
        val dim = span.select($"user_id", $"t0".as("vfrom"), mid.as("vto"),
            lit("bronze").as("tier"))
          .unionByName(span.select($"user_id", mid.as("vfrom"),
            ($"t2" + 1).as("vto"), lit("gold").as("tier")))
        // dim derives from ev — alias both sides or the analyzer flags
        // the lineage-shared user_id as an ambiguous self-join column
        ev.as("e").join(dim.as("di"),
            col("e.user_id") === col("di.user_id") &&
              col("e.us") >= col("di.vfrom") && col("e.us") < col("di.vto"))
          .groupBy(col("e.user_id").as("user_id"), col("di.tier").as("tier"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("e.value").cast("decimal(18,6)")), 4)
              .cast("double").as("total_value"))
          .orderBy($"user_id", $"tier")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS us, value
             |  FROM events WHERE user_id < 50),
             |span AS (SELECT user_id, min(us) AS t0, max(us) AS t2
             |  FROM ev GROUP BY 1),
             |dim AS (
             |  SELECT user_id, t0 AS vfrom, (t0 + t2) // 2 AS vto,
             |    'bronze' AS tier FROM span
             |  UNION ALL
             |  SELECT user_id, (t0 + t2) // 2, t2 + 1, 'gold' FROM span)
             |SELECT e.user_id AS user_id, d.tier, CAST(count(*) AS BIGINT) AS n,
             |  CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             |    AS total_value
             |FROM ev e JOIN dim d
             |  ON e.user_id = d.user_id AND e.us >= d.vfrom AND e.us < d.vto
             |GROUP BY 1, 2 ORDER BY e.user_id, tier""".stripMargin)),

    // -- schema evolution: mergeSchema over mixed-generation files -----------
    // The long-lived-table reality: files written before a column existed
    // sit beside files written after. mergeSchema reconciles the
    // generations at read time (old-generation rows surface NULL for the
    // late column — count(lang) sees only new-generation rows), so a
    // reader never needs the table rewritten. The aggregate proves both
    // generations' ROWS and the late column's null semantics survived the
    // merge.
    QueryDef("q44_schema_evolution",
      (s, d) => {
        import s.implicits._
        val dirPath = java.nio.file.Files.createTempDirectory("graft-schevo")
        try {
          val docs = t(s, d, "documents")
          docs.where($"doc_id" % 2 === 0)
            .select($"doc_id", $"source", $"n_chars")
            .write.parquet(s"$dirPath/g1")
          docs.where($"doc_id" % 2 === 1)
            .select($"doc_id", $"source", $"n_chars", $"lang")
            .write.parquet(s"$dirPath/g2")
          s.read.option("mergeSchema", "true")
            .parquet(s"$dirPath/g1", s"$dirPath/g2")
            .groupBy($"source")
            .agg(count(lit(1)).as("n_docs"),
              count($"lang").as("n_with_lang"),
              sum($"n_chars").as("n_chars"))
            .orderBy($"source")
            .localCheckpoint(true)
        } finally graft.ops.Fs.deleteRecursively(dirPath)
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(CASE WHEN doc_id % 2 = 1 THEN lang END) AS BIGINT)
             |    AS n_with_lang,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin))
  )

  /** q39's statement — blocking-based fuzzy key matching, the classic
    * entity-resolution shape at scale: an equi-join on a cheap blocking key
    * (first 4 normalized chars) carries the shuffle, and the quadratic
    * edit-distance verify runs only INSIDE blocks — never all-pairs
    * (PlanSpec asserts the join is a hash join on the block key, not a
    * cartesian product). One text, two engines.
    */
  private val fuzzyKeysStatement =
    """WITH keys AS (
      |  SELECT doc_id,
      |         substr(lower(regexp_replace(text, '[^a-zA-Z ]', '')), 1, 16) AS k
      |  FROM documents
      |  WHERE doc_id < 200
      |),
      |blocked AS (
      |  SELECT doc_id, k, substr(k, 1, 4) AS blk FROM keys WHERE length(k) >= 4
      |)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(damerau_levenshtein(a.k, b.k) AS BIGINT) AS dl,
      |       round(jaro_winkler_similarity(a.k, b.k), 6) AS jw
      |FROM blocked a JOIN blocked b
      |  ON a.blk = b.blk AND a.doc_id < b.doc_id
      |WHERE damerau_levenshtein(a.k, b.k) <= 6
      |ORDER BY id_a, id_b""".stripMargin

  /** q38's statement — consecutive-document prefix comparisons. */
  private val textSimStatement =
    """WITH pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         substr(a.text, 1, 24) AS ta, substr(b.text, 1, 24) AS tb
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id < 60 AND length(a.text) >= 1 AND length(b.text) >= 1
      |)
      |SELECT id_a, id_b,
      |       round(jaccard(ta, tb), 6) AS jac,
      |       CAST(hamming(lpad(CAST(id_a AS STRING), 6, '0'),
      |                    lpad(CAST(id_b AS STRING), 6, '0')) AS BIGINT) AS ham,
      |       round(jaro_similarity(ta, tb), 6) AS jaro,
      |       round(jaro_winkler_similarity(ta, tb), 6) AS jw,
      |       CAST(damerau_levenshtein(ta, tb) AS BIGINT) AS dl,
      |       CAST(editdist3(ta, tb) AS BIGINT) AS lev
      |FROM pairs
      |ORDER BY id_a""".stripMargin

  /** q37's statement — host JSON constructors over an exact-integer
    * aggregate; the `json(...)` value embeds raw in both engines.
    */
  private val jsonExportStatement =
    """SELECT n_name AS nation,
      |       json_object(
      |         'nation', n_name,
      |         'customers', CAST(count(*) AS INT),
      |         'acct_cents', CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT),
      |         'acct_big', CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) * 12345.0,
      |         'acct_exp', CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) * 1e18,
      |         'flags', json_array('active', true, 1),
      |         'meta', json_object('source', 'tpch', 'schema', json('{"v":1}'))
      |       ) AS payload
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** q36's statement — host-spelled built-ins resolving to native Spark
    * expressions via the DuckCompat alias pack (the CASTs pin the host's
    * BIGINT len/count results to Spark's INT so the dtype-exact driver
    * hash agrees).
    */
  private val duckFuncsStatement =
    """SELECT doc_id,
      |       CAST(len(text) AS INT) AS n_chars,
      |       CAST(len(string_split(text, ' ')) AS INT) AS n_fields,
      |       CAST(list_unique(string_split(lower(text), ' ')) AS INT) AS n_uniq,
      |       CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS INT) AS n_long,
      |       regexp_matches(text, '[0-9][0-9][0-9]') AS has_num3,
      |       list_contains(string_split(lower(text), ' '), 'the') AS has_the
      |FROM documents
      |WHERE doc_id < 50
      |ORDER BY doc_id""".stripMargin

  /** q34's statement — one text, two engines: per-flag rollup packed into a
    * struct with `struct_pack(k := v)`, then unpacked by field access so the
    * compared output is scalar columns (struct round-trip exercised, parquet
    * compare kept flat).
    */
  private val structPackStatement =
    """SELECT s.flag AS flag, s.n AS n, s.qty AS qty
      |FROM (
      |  SELECT struct_pack(
      |    flag := l_returnflag,
      |    n := count(*),
      |    qty := round(sum(l_quantity), 2)
      |  ) AS s
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |ORDER BY flag""".stripMargin

  /** q33's statement — one text, two engines: each customer's single most
    * expensive order, DISTINCT ON semantics.
    */
  private val distinctOnStatement =
    """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_custkey < 300
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** q32's statement — BY-ALL shorthand (GROUP BY ALL / ORDER BY ALL), the
    * host engine's signature ergonomic that Spark also speaks: one text,
    * two engines, byte-identical (the temp view is even named `orders`).
    */
  private val byAllStatement =
    """SELECT o_orderstatus, o_orderpriority,
      |       count(*) AS n, round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** q30's statement — one text, two engines (table names are the only
    * difference). QUALIFY keeps each customer's single most expensive order.
    */
  private def qualifyStatement(orders: String, customer: String): String =
    s"""WITH seg AS (
       |  SELECT c_custkey, c_mktsegment FROM $customer
       |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY'))
       |SELECT c_mktsegment, o_custkey, o_orderkey, round(o_totalprice, 2) AS total
       |FROM $orders o JOIN seg ON o.o_custkey = seg.c_custkey
       |QUALIFY row_number() OVER (PARTITION BY o_custkey
       |                           ORDER BY o_totalprice DESC, o_orderkey) = 1
       |ORDER BY o_custkey""".stripMargin
}
