package graft.graph

/** SRTM `.hgt` raster elevation sampler — the production-shaped DEM
  * source beside the analytic [[PlaneDem]]: Valhalla's skadi elevation
  * reads exactly this tileset layout (the reference's Europe build
  * downloads ~100 GB of them, scripts/BUILD_EUROPE_TILES.md:29-56). The
  * format is public and trivial: one file per 1°×1° cell named
  * `N43E007.hgt` (S/W for negatives), containing an n×n grid of
  * big-endian int16 meters, row 0 the NORTH edge, n = 3601 (SRTM1),
  * 1201 (SRTM3), or any other square side — the side is derived from the
  * file size, so small synthetic fixture tiles are first-class. Void
  * samples are -32768.
  *
  * Sampling is bilinear over the four surrounding posts; a missing tile
  * or any void corner yields NaN, which the `height` action renders as
  * JSON null — the same per-point degradation Valhalla exhibits over
  * partial tilesets. Tiles load lazily through the Hadoop FileSystem
  * (file:/s3a:/hdfs: all resolve) and cache decoded; a 3601² tile is
  * ~26 MB, the working set of a regional request pattern stays small.
  * Driver-side by design, like the rest of the elevation provider
  * (RoutingContext.setElevation's scaladoc has the cluster story).
  */
final class HgtDem(dir: String,
                   conf: org.apache.hadoop.conf.Configuration) {

  private val cache =
    scala.collection.mutable.HashMap[(Int, Int), Option[(Int, Array[Short])]]()

  val Void: Short = -32768

  private def tile(latF: Int, lonF: Int): Option[(Int, Array[Short])] =
    cache.synchronized {
      cache.getOrElseUpdate((latF, lonF), {
        val p = new org.apache.hadoop.fs.Path(dir, HgtDem.tileName(latF, lonF))
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          val bytes = try in.readAllBytes() finally in.close()
          val nSamples = bytes.length / 2
          val side = math.round(math.sqrt(nSamples.toDouble)).toInt
          if (side < 2 || side.toLong * side * 2 != bytes.length) None
          else {
            val grid = new Array[Short](nSamples)
            var i = 0
            while (i < nSamples) {
              grid(i) = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
              i += 1
            }
            Some((side, grid))
          }
        }
      })
    }

  /** Bilinear elevation in meters; NaN for a missing tile or a void
    * corner. SRTM posts sit ON integer-degree seams, duplicated between
    * adjacent tiles — a point exactly on a seam reads whichever owning
    * tile exists (floor()'s tile first, then the south/west neighbour
    * that also covers it), so a tileset edge doesn't null its own border.
    */
  def sample(lat: Double, lon: Double): Double = {
    val latF0 = math.floor(lat).toInt
    val lonF0 = math.floor(lon).toInt
    val latCands = if (lat == latF0) Seq(latF0, latF0 - 1) else Seq(latF0)
    val lonCands = if (lon == lonF0) Seq(lonF0, lonF0 - 1) else Seq(lonF0)
    val hit = (for { la <- latCands; lo <- lonCands } yield (la, lo))
      .iterator.map { case (la, lo) => (la, lo, tile(la, lo)) }
      .collectFirst { case (la, lo, Some(t)) => (la, lo, t) }
    hit match {
      case None => Double.NaN
      case Some((latF, lonF, (n, grid))) =>
        // row 0 = north edge (lat = latF + 1); posts every 1/(n-1) degree
        val x = (lon - lonF) * (n - 1)
        val y = (latF + 1 - lat) * (n - 1)
        val x0 = math.min(n - 2, math.max(0, x.toInt))
        val y0 = math.min(n - 2, math.max(0, y.toInt))
        val fx = x - x0
        val fy = y - y0
        val a = grid(y0 * n + x0); val b = grid(y0 * n + x0 + 1)
        val c = grid((y0 + 1) * n + x0); val d = grid((y0 + 1) * n + x0 + 1)
        if (a == Void || b == Void || c == Void || d == Void) Double.NaN
        else (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy
    }
  }
}

object HgtDem {

  /** SRTM tile naming: `N43E007.hgt` for the cell [43,44)×[7,8). */
  def tileName(latF: Int, lonF: Int): String = {
    val ns = if (latF >= 0) f"N${latF}%02d" else f"S${-latF}%02d"
    val ew = if (lonF >= 0) f"E${lonF}%03d" else f"W${-lonF}%03d"
    s"$ns$ew.hgt"
  }

  /** Write a synthetic `.hgt` tile (fixture generator, the role
    * [[graft.ops.Flac.encode]] plays for audio): `elev(row, col)` in
    * meters with row 0 the north edge, encoded big-endian int16 through
    * the Hadoop FileSystem. Use [[HgtDem]].Void (or -32768) for voids.
    */
  def writeTile(dir: String, latF: Int, lonF: Int, side: Int,
                elev: (Int, Int) => Int,
                conf: org.apache.hadoop.conf.Configuration =
                  new org.apache.hadoop.conf.Configuration()): String = {
    require(side >= 2)
    val p = new org.apache.hadoop.fs.Path(dir, tileName(latF, lonF))
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try {
      val buf = new java.io.BufferedOutputStream(out, 1 << 16)
      var r = 0
      while (r < side) {
        var c = 0
        while (c < side) {
          val v = elev(r, c)
          buf.write((v >> 8) & 0xff); buf.write(v & 0xff)
          c += 1
        }
        r += 1
      }
      buf.flush()
    } finally out.close()
    p.toString
  }
}
