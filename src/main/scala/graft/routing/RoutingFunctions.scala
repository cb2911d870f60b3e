package graft.routing

import graft.geo.{Geo, Wkb}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL function surface — one registered function per reference operator
  * (registration list: src/travel_time_extension.cpp:881-942).
  *
  * Registration captures the [[RouterHandle]] (serializable broadcast
  * handles), so the closures are cluster-safe: executors read the broadcast,
  * never driver state. Null handling: primitive-arg Scala UDFs return NULL on
  * any NULL input without invoking the function — exactly the reference's
  * per-row NULL contract (src/travel_time_extension.cpp:636-639).
  *
  * DOCUMENTED DIVERGENCE — geometry point caps: the reference truncates
  * route geometries at MAX_POINTS 10_000 and isochrone clouds at 50_000
  * (src/travel_time_extension.cpp:489,531), silently dropping tail points.
  * This surface is UNCAPPED: `travel_time_route(_wkb)` geometries carry
  * every path node and `travel_time_isochrone` returns the full reachable
  * cloud — Spark rows have no per-value size ceiling, so truncating would
  * only discard information. Queries needing the reference's exact byte
  * output on >10k-point routes must `slice` themselves.
  */
object RoutingFunctions {

  /** Optimizer rule that gives the state-changing SQL calls their reference
    * semantics by executing them at PLAN time on the DRIVER — the only
    * place a Spark cluster can create broadcasts or launch build jobs:
    *
    *  - `travel_time_load_config(<lit>)` actually loads (idempotent per
    *    path; src/travel_time_extension.cpp:446-462) and folds to true;
    *  - `valhalla_build_tiles(<lit>, <lit>)` runs the distributed
    *    PBF→graph build (src/valhalla_build_tiles_simple.cpp:149-236) and
    *    folds to the produced config path.
    *
    * Functions re-register against the new generation, so the reference's
    * build-then-load-then-query script sequence works statement by
    * statement. Non-literal arguments fall through to the registered UDFs.
    */
  /** Analysis-time placeholder for the driver-side calls when only the
    * session extension is installed (no UDF registration yet): resolves so
    * the plan analyzes, then [[LoadConfigRule]] replaces it. Evaluation
    * reaching an executor means the arguments were non-literal — error out
    * rather than silently no-op.
    */
  final case class DriverSideCall(name: String,
                                  children: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                                  resultType: org.apache.spark.sql.types.DataType)
      extends org.apache.spark.sql.catalyst.expressions.Expression
      with org.apache.spark.sql.catalyst.expressions.Unevaluable {
    override def dataType: org.apache.spark.sql.types.DataType = resultType
    override def nullable: Boolean = false
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]) =
      copy(children = newChildren)
  }

  final class LoadConfigRule(spark: SparkSession)
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, ScalaUDF}
    import org.apache.spark.sql.types.{BooleanType, StringType}

    private def loadConfig(args: Seq[Expression], orig: Expression): Expression =
      args match {
        case Seq(Literal(path, StringType)) if path != null =>
          RoutingContext.loadConfig(spark, path.toString)
          Literal(true, BooleanType)
        case _ => orig
      }

    private def buildTiles(args: Seq[Expression], orig: Expression): Expression =
      args match {
        case Seq(Literal(pbf, StringType), Literal(out, StringType))
            if pbf != null && out != null =>
          // all costings, like the reference's tile build (its tiles serve
          // every costing model; the PBF decode is shared across modes)
          val cfg = graft.graph.GraphStore.buildGraphFromPbf(
            spark, pbf.toString, out.toString, graft.graph.SpeedModel.Modes)
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(cfg), StringType)
        case _ => orig
      }

    override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      plan.transformAllExpressions {
        case u: ScalaUDF if u.udfName.contains("travel_time_load_config") =>
          loadConfig(u.children, u)
        case u: ScalaUDF if u.udfName.contains("valhalla_build_tiles") =>
          buildTiles(u.children, u)
        case d @ DriverSideCall("travel_time_load_config", args, _) =>
          loadConfig(args, d)
        case d @ DriverSideCall("valhalla_build_tiles", args, _) =>
          buildTiles(args, d)
      }
  }

  private def injectLoadConfigRule(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[LoadConfigRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new LoadConfigRule(spark)

  /** Register every travel_time* function against the given handle. */
  def register(spark: SparkSession, handle: RouterHandle): Unit = {
    val h = handle // stable capture

    injectLoadConfigRule(spark)

    spark.udf.register("travel_time",
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double, costing: String) =>
        RoutingOps.travelTimeSeconds(h.requireGraph(costing), lat1, lon1, lat2, lon2))

    spark.udf.register("travel_time_is_loaded", () => h.graphs.nonEmpty)

    // Fallback surface for NON-LITERAL paths (literal calls are intercepted
    // by [[LoadConfigRule]] and actually load): reports whether the path IS
    // the loaded generation. Evaluated per call, not captured at
    // registration, so reloads are visible; driver-state read — on a real
    // cluster the literal/rule path is the supported form.
    spark.udf.register("travel_time_load_config", (path: String) => {
      val loadedKey = RoutingContext.loadedPath.getOrElse("")
      path != null && (path == loadedKey ||
        path.stripSuffix("/" + graft.graph.GraphStore.ConfigName) == loadedKey)
    })

    // Literal calls run driver-side via [[LoadConfigRule]] (the reference's
    // SQL build surface, valhalla_build_tiles_simple.cpp:149-236); the UDF
    // body exists for registry resolution and rejects the non-literal form
    // (a build cannot launch Spark jobs from inside an executor task).
    spark.udf.register("valhalla_build_tiles", (pbf: String, out: String) => {
      val _ = (pbf, out)
      throw new IllegalStateException(
        "valhalla_build_tiles requires literal (pbf_path, output_dir) arguments " +
          "— the build runs driver-side at plan time")
      "": String
    })

    spark.udf.register("travel_time_node_count",
      (costing: String) => h.requireGraph(costing).numNodes)

    spark.udf.register("travel_time_locate",
      (lat: Double, lon: Double, costing: String) =>
        RoutingOps.locate(h.requireGraph(costing), lat, lon))

    spark.udf.register("travel_time_snap",
      (lat: Double, lon: Double, costing: String) =>
        RoutingOps.snap(h.requireGraph(costing), lat, lon))

    // the `travel_time_route` macro surface (examples/geometry_macro.sql:30-36).
    // Bytes, like _wkb: GEOMETRY arguments (st_point WKB — the reference
    // macro's signature, test/sql/monaco_routing.test:150) pass through
    // unchanged, and WKT-string endpoints arrive via Spark's implicit
    // STRING→BINARY cast and route through routeAny's UTF-8 WKT fallback —
    // the host's VARCHAR→BLOB coercion, so both spellings work
    spark.udf.register("travel_time_route",
      (from: Array[Byte], to: Array[Byte], costing: String) =>
        RoutingOps.routeAny(h.requireGraph(costing), from, to))

    // `travel_time_route_geom` (ITALY.md:154-166,258-272): the reference's
    // "already GEOMETRY" variant. WKB is this engine's canonical geometry
    // form, so the surface is identical to travel_time_route — registered
    // under its own name so the doc statements run verbatim
    spark.udf.register("travel_time_route_geom",
      (from: Array[Byte], to: Array[Byte], costing: String) =>
        RoutingOps.routeAny(h.requireGraph(costing), from, to))

    // WKB-blob endpoints (canonical form, src/travel_time_extension.cpp:899-911)
    spark.udf.register("travel_time_route_wkb",
      (from: Array[Byte], to: Array[Byte], costing: String) =>
        RoutingOps.routeAny(h.requireGraph(costing), from, to))

    // scalar surface: explode(travel_time_matrix(...)) over column arrays
    spark.udf.register("travel_time_matrix",
      (srcLats: Seq[Double], srcLons: Seq[Double],
       dstLats: Seq[Double], dstLons: Seq[Double], costing: String) =>
        RoutingOps.matrixEntries(h.requireGraph(costing), srcLats, srcLons, dstLats, dstLons))

    // table-function surface — the reference's FROM-position form
    // (test/sql/monaco_routing.test:108-124: `FROM travel_time_matrix([..],
    // ..., 'auto')`). Literal arrays evaluate at plan time; the bounded
    // matrix (the host caps pairs at 2500) materializes as a LocalRelation.
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "travel_time_matrix", matrixTableBuilder(h), "scala_udf")

    spark.udf.register("travel_time_isochrone",
      (lat: Double, lon: Double, maxSeconds: Double, costing: String) =>
        RoutingOps.isochrone(h.requireGraph(costing), lat, lon, maxSeconds))

    spark.udf.register("travel_time_isochrone_geojson",
      (lat: Double, lon: Double, cutoffsMinutes: Seq[Double], costing: String) =>
        RoutingOps.isochroneContours(h.requireGraph(costing), lat, lon, cutoffsMinutes))

    spark.udf.register("travel_time_request",
      (action: String, json: String) => RequestApi.dispatch(h, action, json))
  }

  /** Unified ANY-typed route dispatch for the DataFrame API: resolves WKT vs
    * WKB by each column's declared schema type — the Spark analogue of the
    * reference's per-row byte sniffing (src/travel_time_extension.cpp:227-385;
    * divergence documented in SURVEY §7 risk 2: we sniff by declared type,
    * plus the WKB byte-sniff inside the binary branch).
    */
  def routeUnified(df: DataFrame, fromCol: String, toCol: String,
                   costing: String, handle: RouterHandle): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val h = handle
    def asAnchor(name: String): org.apache.spark.sql.Column =
      df.schema(name).dataType match {
        case StringType =>
          udf((s: String) => RoutingOps.anchorOf(s)).apply(col(name))
        case BinaryType =>
          udf((b: Array[Byte]) => RoutingOps.anchorOf(b)).apply(col(name))
        case other =>
          throw new IllegalArgumentException(
            s"Column $name: expected WKT STRING or WKB BINARY, got $other")
      }
    val routeFromAnchors = udf((f: (Double, Double), t: (Double, Double)) =>
      if (f == null || t == null) None
      else RoutingOps.route(h.requireGraph(costing), f, t))
    routeFromAnchors(asAnchor(fromCol), asAnchor(toCol))
  }

  /** Builder for the FROM-position `travel_time_matrix(...)` table function:
    * the four coordinate arrays and the costing must be literal (foldable) —
    * a driver-side plan-time evaluation, like the host's table function
    * binding. Output schema matches the host's (from_idx, to_idx,
    * distance_m, duration_s).
    */
  private def matrixTableBuilder(h: RouterHandle)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = { exprs =>
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    if (exprs.length != 5) throw new IllegalArgumentException(
      s"travel_time_matrix expects (src_lats, src_lons, dst_lats, dst_lons, costing), " +
        s"got ${exprs.length} arguments")
    def doubles(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Double] = {
      if (!e.foldable) throw new IllegalArgumentException(
        "travel_time_matrix in FROM position expects literal coordinate arrays")
      e.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          (0 until a.numElements()).map { i =>
            a.get(i, e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
              .elementType) match {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float => f.doubleValue()
              case d: org.apache.spark.sql.types.Decimal => d.toDouble
              case l: java.lang.Long => l.doubleValue()
              case i2: java.lang.Integer => i2.doubleValue()
              case other => throw new IllegalArgumentException(
                s"travel_time_matrix: non-numeric coordinate $other")
            }
          }
        case other => throw new IllegalArgumentException(
          s"travel_time_matrix: expected an array, got $other")
      }
    }
    val costing = {
      val e = exprs(4)
      if (!e.foldable) throw new IllegalArgumentException(
        "travel_time_matrix: costing must be a literal")
      String.valueOf(e.eval())
    }
    val entries = RoutingOps.matrixEntries(h.requireGraph(costing),
      doubles(exprs(0)), doubles(exprs(1)), doubles(exprs(2)), doubles(exprs(3)))
    val output = Seq(
      AttributeReference("from_idx", org.apache.spark.sql.types.IntegerType, nullable = false)(),
      AttributeReference("to_idx", org.apache.spark.sql.types.IntegerType, nullable = false)(),
      AttributeReference("distance_m", org.apache.spark.sql.types.DoubleType, nullable = false)(),
      AttributeReference("duration_s", org.apache.spark.sql.types.DoubleType, nullable = false)())
    LocalRelation(output, entries.map(m =>
      InternalRow(m.from_idx, m.to_idx, m.distance_m, m.duration_s)))
  }
}

/** DataFrame-level operators: the scale path. Sources/destinations are
  * DataFrames of any size; each source partition computes matrix rows with a
  * reusable per-thread calculator (reference's rayon pattern,
  * rust/src/lib.rs:498-533).
  */
object TravelTime {

  /** OD matrix: sources(idx INT, lat, lon) × dests(idx INT, lat, lon) →
    * (from_idx, to_idx, distance_m, duration_s). Destinations are collected
    * and broadcast (matrix destinations are bounded — the reference caps
    * matrix pairs at 2500, src/valhalla_build_tiles_simple.cpp:104-129);
    * sources scale horizontally as partitions.
    */
  def matrix(spark: SparkSession, sources: DataFrame, dests: DataFrame,
             costing: String, handle: RouterHandle): DataFrame = {
    import spark.implicits._
    val h = handle
    val destArr = dests.select($"idx".cast("int"), $"lat".cast("double"), $"lon".cast("double"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    val destB = spark.sparkContext.broadcast(destArr)
    sources.select($"idx".cast("int"), $"lat".cast("double"), $"lon".cast("double"))
      .as[(Int, Double, Double)]
      .mapPartitions { it =>
        val g = h.requireGraph(costing)
        val d = Routers.calculator(g)
        val dsts = destB.value
        val dstNodes = dsts.map(x => g.snap(x._2, x._3))
        it.flatMap { case (si, slat, slon) =>
          val s = g.snap(slat, slon)
          val row = d.oneToMany(s, dstNodes)
          row.indices.iterator.map { di =>
            val (ms, m) = row(di)
            if (ms < 0) MatrixEntry(si, dsts(di)._1, -1.0, -1.0)
            else MatrixEntry(si, dsts(di)._1, m, ms / 1000.0)
          }
        }
      }.toDF()
  }

  /** Batched isochrones: one bounded Dijkstra per (idx, lat, lon) source row,
    * distributed over partitions.
    */
  def isochrones(spark: SparkSession, sources: DataFrame, maxSeconds: Double,
                 costing: String, handle: RouterHandle): DataFrame = {
    import spark.implicits._
    val h = handle
    sources.select($"idx".cast("int"), $"lat".cast("double"), $"lon".cast("double"))
      .as[(Int, Double, Double)]
      .mapPartitions { it =>
        val g = h.requireGraph(costing)
        it.flatMap { case (idx, lat, lon) =>
          RoutingOps.isochrone(g, lat, lon, maxSeconds)
            .iterator.map(n => (idx, n.lat, n.lon, n.seconds))
        }
      }.toDF("idx", "lat", "lon", "seconds")
  }
}
