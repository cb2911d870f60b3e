package graft.ops

/** TAR (POSIX ustar) archive walk — text corpora outside the crawl
  * world overwhelmingly ship as `.tar.gz` (Gutenberg dumps, academic
  * corpus releases, dataset mirrors). JDK has gzip but no tar; this is
  * the from-scratch member walk, strict the way the other containers
  * here are:
  *
  *  - 512-byte headers, NUL-terminated name + 155-byte `prefix` field
  *    (the ustar long-path split), size in OCTAL (the classic parser
  *    bug reads it as decimal and shears every member after the
  *    first);
  *  - the header CHECKSUM is verified (sum of header bytes with the
  *    checksum field as spaces) — silent bit rot in an archive header
  *    otherwise mis-frames every following member;
  *  - regular files ('0' or NUL) extract; directories, links, PAX
  *    headers and other typeflags are SKIPPED structurally (their
  *    data blocks are stepped over, so one exotic entry cannot
  *    de-align the rest);
  *  - end-of-archive is two zero blocks; data is padded to 512.
  *
  * Malformed input is DATA: bad magic, a checksum mismatch, a size
  * overrunning the archive, or a truncated trailer → None.
  *
  * Scale note: per-blob CPU inside `mapPartitions` — shuffle-free; at
  * 100 TB the unit of parallelism is the archive, the same contract as
  * the WARC/ARC readers.
  */
object Tar {

  private final class TarRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new TarRefused(msg)

  /** Regular-file members (path, bytes) in archive order. None on any
    * violation.
    */
  def extract(bytes: Array[Byte]): Option[Vector[(String, Array[Byte])]] = {
    if (bytes == null || bytes.length < 1024 || bytes.length % 512 != 0)
      return None
    try Some(walk(bytes))
    catch { case _: TarRefused => None }
  }

  private def walk(b: Array[Byte]): Vector[(String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    var p = 0
    var ended = false
    while (!ended) {
      if (p + 512 > b.length) bad("missing end-of-archive blocks")
      if (isZeroBlock(b, p)) {
        if (p + 1024 > b.length || !isZeroBlock(b, p + 512))
          bad("single zero block is not a trailer")
        ended = true
      } else {
        // ustar magic: "ustar\0" (POSIX) or "ustar " (GNU)
        if (!(b(p + 257) == 'u' && b(p + 258) == 's' && b(p + 259) == 't' &&
          b(p + 260) == 'a' && b(p + 261) == 'r')) bad("bad ustar magic")
        verifyChecksum(b, p)
        val name = cstr(b, p, 100)
        val prefix = cstr(b, p + 345, 155)
        val path = if (prefix.isEmpty) name else prefix + "/" + name
        val size = octal(b, p + 124, 12)
        val typeflag = b(p + 156)
        val dataBlocks = ((size + 511) / 512).toInt
        if (p + 512 + dataBlocks * 512 > b.length) bad("member overruns archive")
        if (typeflag == '0' || typeflag == 0) {
          if (path.isEmpty) bad("regular file without a name")
          out += path -> java.util.Arrays.copyOfRange(
            b, p + 512, p + 512 + size.toInt)
        } // else: directory/link/PAX/etc — stepped over, never extracted
        p += 512 + dataBlocks * 512
      }
    }
    out.result()
  }

  private def isZeroBlock(b: Array[Byte], p: Int): Boolean = {
    var i = 0
    while (i < 512) { if (b(p + i) != 0) return false; i += 1 }
    true
  }

  private def cstr(b: Array[Byte], off: Int, max: Int): String = {
    var n = 0
    while (n < max && b(off + n) != 0) n += 1
    new String(b, off, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    var seen = false
    while (i < len) {
      val c = b(off + i)
      if (c >= '0' && c <= '7') {
        v = v * 8 + (c - '0'); seen = true
        if (v > Int.MaxValue) bad("member size overflow")
      } else if (c != 0 && c != ' ') bad(s"non-octal size byte ${c.toChar}")
      i += 1
    }
    if (!seen) bad("empty size field")
    v
  }

  private def verifyChecksum(b: Array[Byte], p: Int): Unit = {
    val declared = octal(b, p + 148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' ' else b(p + i) & 0xff)
      i += 1
    }
    if (sum != declared) bad(s"checksum $sum != declared $declared")
  }

  // ---------------------------------------------------------------------------
  // Writer (fixture side)
  // ---------------------------------------------------------------------------

  /** Deterministic ustar archive of regular-file (path, bytes)
    * members. Paths over 100 bytes split into prefix/name at a '/'
    * boundary (refuses if impossible — matching the strict reader's
    * world).
    */
  def write(members: Seq[(String, Array[Byte])]): Array[Byte] =
    writeEntries(members.map { case (p, d) => (p, d, '0'.toByte) })

  /** [[write]] with explicit typeflags — the fixture side plants
    * directory ('5') and PAX ('x') entries the reader must step over.
    */
  def writeEntries(members: Seq[(String, Array[Byte], Byte)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((path, data, typeflag) <- members) {
      val (prefix, name) =
        if (path.getBytes("UTF-8").length <= 100) ("", path)
        else {
          val cut = path.lastIndexOf('/', 155) // prefix field is 155 bytes
          require(cut > 0 && path.length - cut - 1 <= 100,
            s"unsplittable long path: $path")
          (path.substring(0, cut), path.substring(cut + 1))
        }
      val h = new Array[Byte](512)
      putStr(h, 0, 100, name)
      putOctal(h, 100, 8, 0x1a4) // 0644
      putOctal(h, 108, 8, 0); putOctal(h, 116, 8, 0)
      putOctal(h, 124, 12, data.length.toLong)
      putOctal(h, 136, 12, 1325376000L) // fixed mtime: 2012-01-01
      h(156) = typeflag
      putStr(h, 257, 6, "ustar"); h(263) = '0'; h(264) = '0'
      putStr(h, 265, 32, "graft"); putStr(h, 297, 32, "graft")
      putStr(h, 345, 155, prefix)
      // checksum: field as spaces, then octal + NUL + space
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      val cs = ("%06o".format(sum) + "\u0000 ").getBytes("US-ASCII")
      System.arraycopy(cs, 0, h, 148, 8)
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // end-of-archive
    out.toByteArray
  }

  private def putStr(h: Array[Byte], off: Int, max: Int, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(b.length <= max, s"field too long: $s")
    System.arraycopy(b, 0, h, off, b.length)
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (len - 1 - s.length)) + s
    require(padded.length == len - 1, s"octal overflow: $v in $len")
    System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off, len - 1)
    h(off + len - 1) = 0
  }
}
