package graft.graph

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet graph cache + config file — the analogue of the reference's
  * cache/config lifecycle:
  *  - per-mode `<dir>/<mode>/{nodes,edges}.parquet`, mirroring the
  *    `<pbf>.<mode>.routing` bincode cache convention (rust/src/lib.rs:164-166)
  *  - `<dir>/graft_routing.json` config manifest, playing the role of the
  *    generated `valhalla.json` (src/valhalla_build_tiles_simple.cpp:16-146):
  *    `travel_time_load_config` smart-path detection appends it to a
  *    directory argument exactly like the reference appends `/valhalla.json`
  *    (src/config_setting.cpp:33-39).
  *
  * Build + save is the `valhalla_build_tiles` analogue
  * (src/valhalla_build_tiles_simple.cpp:153-235) minus the shell-out: graph
  * construction is native Spark ETL, so the "tile build" is a distributed
  * job writing partitioned parquet, not a subprocess.
  */
/** Elevation source declared in the graph config — the analogue of
  * Valhalla wiring elevation through its config
  * (`additional_data.elevation` in its generated json,
  * src/valhalla_build_tiles_simple.cpp:16-146). Two kinds: the analytic
  * [[PlaneDem]] (oracle-friendly synthetic surface) and [[HgtDemDir]]
  * (a real SRTM `.hgt` raster tileset — the production shape, what the
  * reference's Europe build downloads ~100 GB of,
  * scripts/BUILD_EUROPE_TILES.md:29-56).
  */
sealed trait DemConfig

/** Analytic plane elevation surface — enough to make the `height` request
  * action value-bearing and exactly oracle-checkable.
  */
case class PlaneDem(base: Double, perDegLat: Double, perDegLon: Double)
    extends DemConfig {
  def sample(lat: Double, lon: Double): Double =
    base + perDegLat * lat + perDegLon * lon
}

/** SRTM raster tileset directory ([[HgtDem]] does the sampling).
  * Relative paths resolve against the config's own directory at load.
  */
case class HgtDemDir(dir: String) extends DemConfig

object GraphStore {
  final val ConfigName = "graft_routing.json"

  /** Distributed build from OSM-shaped inputs, persisted per mode. Returns
    * the config path (like valhalla_build_tiles returning the config path).
    */
  def buildGraph(spark: SparkSession, ways: DataFrame, rawNodes: DataFrame,
                 outDir: String, modes: Seq[String] = Seq("auto")): String = {
    modes.foreach { m =>
      val edges = GraphBuilder.buildEdges(spark, ways, rawNodes, m)
      val nodes = GraphBuilder.usedNodes(spark, rawNodes, edges)
      edges.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$m/edges.parquet")
      nodes.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$m/nodes.parquet")
    }
    writeConfig(outDir, modes)
  }

  /** Full `valhalla_build_tiles` analogue from a real OSM PBF extract:
    * distributed PBF decode → per-mode graph ETL → parquet tiles + config.
    */
  def buildGraphFromPbf(spark: SparkSession, pbfPath: String, outDir: String,
                        modes: Seq[String] = Seq("auto")): String = {
    val (rawNodes, ways) = OsmPbf.read(spark, pbfPath)
    buildGraph(spark, ways, rawNodes, outDir, modes)
  }

  /** Persist already-built per-mode (nodes, edges) DataFrames. A
    * [[PlaneDem]] lands in the config's `elevation` entry, so loading the
    * config also wires the `height` action's sampler — elevation is part
    * of the graph generation, exactly like Valhalla's config'd elevation
    * dir.
    */
  def save(byMode: Map[String, (DataFrame, DataFrame)], outDir: String,
           dem: Option[DemConfig] = None): String = {
    byMode.foreach { case (m, (nodes, edges)) =>
      nodes.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$m/nodes.parquet")
      edges.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$m/edges.parquet")
    }
    writeConfig(outDir, byMode.keys.toSeq.sorted, dem)
  }

  private def writeConfig(outDir: String, modes: Seq[String],
                          dem: Option[DemConfig] = None): String = {
    val demJson = dem.map {
      case p: PlaneDem =>
        s""", "elevation": {"kind": "plane", "base": ${p.base}, """ +
          s""""per_deg_lat": ${p.perDegLat}, "per_deg_lon": ${p.perDegLon}}"""
      case h: HgtDemDir =>
        s""", "elevation": {"kind": "hgt", "dem_dir": "${h.dir.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
    }.getOrElse("")
    val cfg = s"""{"format": "graft-graph-parquet", "version": 1, """ +
      s""""modes": [${modes.sorted.map("\"" + _ + "\"").mkString(", ")}]$demJson}"""
    val path = java.nio.file.Paths.get(outDir, ConfigName)
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, cfg)
    path.toString
  }

  /** The config's optional `elevation` plane, if declared — read through
    * the Hadoop FileSystem like [[resolveConfig]]. Number parsing accepts
    * the plain decimal/scientific forms `writeConfig` emits.
    */
  def readDem(cfgPath: String,
              conf: org.apache.hadoop.conf.Configuration =
                new org.apache.hadoop.conf.Configuration()): Option[PlaneDem] = {
    val p = new org.apache.hadoop.fs.Path(cfgPath)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val at = text.indexOf("\"elevation\"")
    if (at < 0) return None
    val seg = text.substring(at)
    def num(key: String): Option[Double] =
      (s""""$key"\\s*:\\s*(-?[0-9.eE+-]+)""").r.findFirstMatchIn(seg)
        .map(_.group(1).toDouble)
    for (b <- num("base"); a <- num("per_deg_lat"); c <- num("per_deg_lon"))
      yield PlaneDem(b, a, c)
  }

  /** The config's elevation entry as a SAMPLER, whichever kind it
    * declares: a plane evaluates analytically, an `hgt` tileset samples
    * the [[HgtDem]] raster (relative `dem_dir` resolves against the
    * config's directory — the tileset normally travels WITH the graph
    * store, like Valhalla's elevation dir beside its tiles). None when no
    * elevation is declared; a raster sampler returns NaN per point where
    * tiles are missing or void (rendered as JSON null by `height`).
    */
  def readElevation(cfgPath: String,
                    conf: org.apache.hadoop.conf.Configuration =
                      new org.apache.hadoop.conf.Configuration())
      : Option[(Double, Double) => Double] = {
    readDem(cfgPath, conf) match {
      case Some(plane) => return Some(plane.sample)
      case None => ()
    }
    val p = new org.apache.hadoop.fs.Path(cfgPath)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val at = text.indexOf("\"elevation\"")
    if (at < 0) return None
    val seg = text.substring(at)
    if (!"""\"kind\"\s*:\s*\"hgt\"""".r.findFirstIn(seg).isDefined) return None
    """"dem_dir"\s*:\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(seg).map { m =>
      val raw = m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
      val demPath = new org.apache.hadoop.fs.Path(raw)
      val resolved =
        if (demPath.isAbsolute || raw.contains("://")) raw
        else new org.apache.hadoop.fs.Path(p.getParent, raw).toString
      new HgtDem(resolved, conf).sample _
    }
  }

  /** Smart-path resolution: a directory argument means `<dir>/graft_routing
    * .json` (src/config_setting.cpp:33-39). Returns (configPath, modes).
    * Opens through Hadoop FileSystem, so tile stores on `s3a://`, `hdfs://`
    * or `file:` resolve the same as local paths (the reference's
    * S3-mounted-tiles example, examples/s3_tiles_example.sql:20-27).
    */
  def resolveConfig(path: String,
                    conf: org.apache.hadoop.conf.Configuration =
                      new org.apache.hadoop.conf.Configuration()): (String, Seq[String]) = {
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs = p0.getFileSystem(conf)
    val isDir =
      try fs.getFileStatus(p0).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    val cfg0 = if (isDir) new org.apache.hadoop.fs.Path(p0, ConfigName) else p0
    // the host's config filename spelling: `<dir>/valhalla.json` resolves
    // to this store's config when present (monaco_end_to_end.sql:104)
    val cfg =
      if (!fs.exists(cfg0) && p0.getName == "valhalla.json" &&
        p0.getParent != null &&
        fs.exists(new org.apache.hadoop.fs.Path(p0.getParent, ConfigName)))
        new org.apache.hadoop.fs.Path(p0.getParent, ConfigName)
      else cfg0
    if (!fs.exists(cfg))
      throw new IllegalArgumentException(
        s"Routing config not found: $cfg (reference contract: src/config_setting.cpp:45-49)")
    val in = fs.open(cfg)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    // scan only the modes ARRAY: keys of later config entries (e.g.
    // "elevation") must not parse as modes
    val after = text.substring(text.indexOf("modes"))
    val arr = after.substring(after.indexOf('['), after.indexOf(']') + 1)
    val modes = "\"([a-z]+)\"".r.findAllMatchIn(arr).map(_.group(1)).toSeq
    (cfg.toString, modes)
  }
}
