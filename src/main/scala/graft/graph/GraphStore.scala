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

  /** Persist already-built per-mode (nodes, edges) DataFrames. */
  def save(byMode: Map[String, (DataFrame, DataFrame)], outDir: String): String = {
    byMode.foreach { case (m, (nodes, edges)) =>
      nodes.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$m/nodes.parquet")
      edges.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$m/edges.parquet")
    }
    writeConfig(outDir, byMode.keys.toSeq.sorted)
  }

  private def writeConfig(outDir: String, modes: Seq[String]): String = {
    val cfg = s"""{"format": "graft-graph-parquet", "version": 1, """ +
      s""""modes": [${modes.sorted.map("\"" + _ + "\"").mkString(", ")}]}"""
    val path = java.nio.file.Paths.get(outDir, ConfigName)
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, cfg)
    path.toString
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
    val modes = "\"([a-z]+)\"".r.findAllMatchIn(
      text.substring(text.indexOf("modes"))).map(_.group(1)).toSeq
    (cfg.toString, modes)
  }
}
