package graft.ops

/** OLE2 / Compound File Binary (MS-CFB) container — the format under
  * every legacy Office document (.doc/.xls/.ppt/.msg), still a large
  * slice of real crawls. Reference scope: the reference ships no
  * document extractors (`/root/reference/src` delegates scans to
  * DuckDB); this is infrastructure for [[Doc]] the way [[Opc]] is for
  * the OOXML quartet.
  *
  * Reader semantics (strict, refusal over garbage):
  *  - version-3 files (512-byte sectors, the wire format Word 97-2003
  *    writes); version 4 (4096) refuses explicitly;
  *  - FAT resolved through the 109 header DIFAT entries plus chained
  *    DIFAT sectors, all chains cycle-guarded (a crafted loop is data,
  *    not a hang — the PDF /Prev lesson);
  *  - directory entries (128 bytes, UTF-16LE names) walked as a flat
  *    list; storages are ignored, streams are materialized;
  *  - streams smaller than the mini-stream cutoff (4096) read from the
  *    MINI stream (the root entry's chain) through the mini-FAT with
  *    64-byte sectors — the part naive readers skip, and then every
  *    small stream (a .doc's 0Table is typically small) comes back
  *    empty;
  *  - sizes are trusted only within materialized bounds; any
  *    out-of-range sector, over-long chain, or truncated read refuses.
  *
  * The writer emits the same subset deterministically (fixture side):
  * DIFAT in-header only (≤109 FAT sectors — gigabytes of room at
  * fixture scale), mini stream + mini FAT for small streams, red-black
  * directory flattened to a simple ordered tree.
  */
object Cfb {

  private val Magic = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    .map(_.toByte)

  private val FREESECT = 0xffffffff
  private val ENDOFCHAIN = 0xfffffffe
  private val FATSECT = 0xfffffffd
  private val DIFSECT = 0xfffffffc

  private val SectorSize = 512
  private val MiniSectorSize = 64
  private val MiniCutoff = 4096

  private final class CfbRefused(msg: String) extends RuntimeException(msg)
  private def bad(msg: String): Nothing = throw new CfbRefused(msg)

  /** All streams (name → bytes) of a CFB container; None on any
    * structural violation.
    */
  def read(bytes: Array[Byte]): Option[Map[String, Array[Byte]]] = {
    if (bytes == null || bytes.length < SectorSize) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Magic(i)) return None; i += 1 }
    try Some(readStrict(bytes))
    catch {
      case _: CfbRefused => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def s32(b: Array[Byte], o: Int): Int = u32(b, o).toInt

  private def readStrict(b: Array[Byte]): Map[String, Array[Byte]] = {
    if (u16(b, 26) != 3) bad(s"unsupported major version ${u16(b, 26)}")
    if (u16(b, 28) != 0xfffe) bad("not little-endian")
    if (u16(b, 30) != 9) bad("sector shift != 512")
    if (u16(b, 32) != 6) bad("mini sector shift != 64")
    val nFat = s32(b, 44)
    val firstDir = s32(b, 48)
    if (u32(b, 56) != MiniCutoff) bad("nonstandard mini cutoff")
    val firstMiniFat = s32(b, 60)
    val nMiniFat = s32(b, 64)
    val firstDifat = s32(b, 68)
    val nDifat = s32(b, 72)
    val nSectors = (b.length - SectorSize) / SectorSize

    def sectorOff(sect: Int): Int = {
      if (sect < 0 || sect >= nSectors) bad(s"sector $sect out of range")
      SectorSize + sect * SectorSize
    }

    // DIFAT: 109 in-header entries + chained DIFAT sectors
    val fatSects = new scala.collection.mutable.ArrayBuffer[Int]()
    var k = 0
    while (k < 109 && fatSects.length < nFat) {
      val e = s32(b, 76 + 4 * k)
      if (e != FREESECT) fatSects += e
      k += 1
    }
    var dif = firstDifat
    val seenDif = new java.util.HashSet[Integer]()
    var difCount = 0
    while (dif != ENDOFCHAIN && dif != FREESECT) {
      if (!seenDif.add(dif)) bad("DIFAT cycle")
      difCount += 1
      if (difCount > nDifat + 1) bad("DIFAT over-long")
      val off = sectorOff(dif)
      var j = 0
      while (j < 127 && fatSects.length < nFat) {
        val e = s32(b, off + 4 * j)
        if (e != FREESECT) fatSects += e
        j += 1
      }
      dif = s32(b, off + 4 * 127)
    }
    if (fatSects.length != nFat) bad(s"FAT sector count ${fatSects.length} != $nFat")

    // materialize the FAT
    val fat = new Array[Int](nFat * 128)
    var fi = 0
    for (fs <- fatSects) {
      val off = sectorOff(fs)
      var j = 0
      while (j < 128) { fat(fi) = s32(b, off + 4 * j); fi += 1; j += 1 }
    }

    def chain(start: Int, maxLen: Int): Vector[Int] = {
      val out = Vector.newBuilder[Int]
      val seen = new java.util.HashSet[Integer]()
      var s = start
      var n = 0
      while (s != ENDOFCHAIN) {
        if (s == FREESECT || s == FATSECT || s == DIFSECT) bad(s"bad chain entry $s")
        if (!seen.add(s)) bad("FAT chain cycle")
        n += 1
        if (n > maxLen) bad("chain over-long")
        out += s
        if (s < 0 || s >= fat.length) bad(s"chain sector $s outside FAT")
        s = fat(s)
      }
      out.result()
    }

    def readChain(start: Int, size: Int): Array[Byte] = {
      val sects = chain(start, size / SectorSize + 2)
      if (sects.length * SectorSize < size) bad("chain shorter than stream size")
      val out = new Array[Byte](size)
      var pos = 0
      for (s <- sects if pos < size) {
        val off = sectorOff(s)
        val n = math.min(SectorSize, size - pos)
        System.arraycopy(b, off, out, pos, n)
        pos += n
      }
      out
    }

    // directory
    val dirBytes = {
      val sects = chain(firstDir, nSectors + 1)
      val out = new Array[Byte](sects.length * SectorSize)
      var pos = 0
      for (s <- sects) {
        System.arraycopy(b, sectorOff(s), out, pos, SectorSize); pos += SectorSize
      }
      out
    }
    val nEntries = dirBytes.length / 128

    // root entry: holds the mini stream
    if (nEntries == 0) bad("empty directory")
    if ((dirBytes(66) & 0xff) != 5) bad("first directory entry is not root")
    val miniStream = {
      val start = s32(dirBytes, 116)
      val size = u32(dirBytes, 120)
      if (size > b.length.toLong) bad("mini stream larger than file")
      if (size == 0) new Array[Byte](0) else readChain(start, size.toInt)
    }

    // mini FAT
    val miniFat: Array[Int] =
      if (nMiniFat == 0) new Array[Int](0)
      else {
        val mf = readChain(firstMiniFat, nMiniFat * SectorSize)
        val out = new Array[Int](mf.length / 4)
        var j = 0
        while (j < out.length) { out(j) = s32(mf, 4 * j); j += 1 }
        out
      }

    def readMiniChain(start: Int, size: Int): Array[Byte] = {
      val out = new Array[Byte](size)
      val seen = new java.util.HashSet[Integer]()
      var s = start
      var pos = 0
      while (s != ENDOFCHAIN) {
        if (!seen.add(s)) bad("mini chain cycle")
        if (s < 0 || s >= miniFat.length) bad(s"mini sector $s outside miniFAT")
        val off = s * MiniSectorSize
        if (off + MiniSectorSize > miniStream.length) bad("mini sector outside mini stream")
        if (pos < size) {
          val n = math.min(MiniSectorSize, size - pos)
          System.arraycopy(miniStream, off, out, pos, n)
          pos += n
        }
        s = miniFat(s)
      }
      if (pos < size) bad("mini chain shorter than stream size")
      out
    }

    val streams = Map.newBuilder[String, Array[Byte]]
    var e = 1
    while (e < nEntries) {
      val off = e * 128
      val objType = dirBytes(off + 66) & 0xff
      if (objType == 2) { // stream
        val nameLen = u16(dirBytes, off + 64)
        if (nameLen >= 2 && nameLen <= 64) {
          val name = new String(dirBytes, off, nameLen - 2, // drop NUL
            java.nio.charset.StandardCharsets.UTF_16LE)
          val start = s32(dirBytes, off + 116)
          val sizeL = u32(dirBytes, off + 120)
          if (sizeL > Int.MaxValue) bad("stream too large")
          val size = sizeL.toInt
          val data =
            if (size == 0) new Array[Byte](0)
            else if (size < MiniCutoff) readMiniChain(start, size)
            else readChain(start, size)
          streams += name -> data
        }
      }
      e += 1
    }
    streams.result()
  }

  // ---------------------------------------------------------------------------
  // Writer (fixture side)
  // ---------------------------------------------------------------------------

  /** Deterministic version-3 container holding `streams` in iteration
    * order. Small streams (<4096) go through the mini stream + mini
    * FAT; large ones through the regular FAT. In-header DIFAT only
    * (plenty at fixture scale; over 109 FAT sectors refuses loudly).
    */
  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(streams.nonEmpty, "no streams")
    val small = streams.filter(_._2.length < MiniCutoff)
    val large = streams.filter(_._2.length >= MiniCutoff)

    def pad(n: Int, unit: Int): Int = (n + unit - 1) / unit * unit

    // mini stream: small streams packed at 64-byte boundaries
    val miniOffsets = scala.collection.mutable.Map[String, Int]()
    val miniBuf = new java.io.ByteArrayOutputStream()
    for ((name, data) <- small) {
      miniOffsets(name) = miniBuf.size() / MiniSectorSize
      miniBuf.write(data)
      val padded = pad(data.length, MiniSectorSize)
      miniBuf.write(new Array[Byte](padded - data.length))
    }
    val miniStream = miniBuf.toByteArray
    val nMiniSects = miniStream.length / MiniSectorSize

    // mini FAT: one chain per small stream
    val miniFat = Array.fill(pad(math.max(nMiniSects, 1), 128))(FREESECT)
    for ((name, data) <- small) {
      val start = miniOffsets(name)
      val n = pad(math.max(data.length, 1), MiniSectorSize) / MiniSectorSize
      var j = 0
      while (j < n) {
        miniFat(start + j) = if (j == n - 1) ENDOFCHAIN else start + j + 1
        j += 1
      }
    }
    val nMiniFatSects = pad(miniFat.length * 4, SectorSize) / SectorSize

    // sector plan: [dir sectors][miniFAT sectors][mini stream sectors]
    // [large streams][FAT sectors]
    val nDirEntries = 1 + streams.length
    val nDirSects = pad(nDirEntries * 128, SectorSize) / SectorSize
    val nMiniStreamSects = pad(miniStream.length, SectorSize) / SectorSize
    val largeSects = large.map { case (_, d) => pad(d.length, SectorSize) / SectorSize }

    val dirStart = 0
    val miniFatStart = dirStart + nDirSects
    val miniStreamStart = miniFatStart + nMiniFatSects
    val largeStarts = {
      var at = miniStreamStart + nMiniStreamSects
      largeSects.map { n => val s = at; at += n; s }
    }
    val fatStart = miniStreamStart + nMiniStreamSects + largeSects.sum
    val nDataSects = fatStart
    // FAT must also cover its own sectors
    var nFatSects = pad((nDataSects + 1) * 4, SectorSize) / SectorSize
    while (pad((nDataSects + nFatSects) * 4, SectorSize) / SectorSize > nFatSects)
      nFatSects += 1
    require(nFatSects <= 109, "fixture writer: in-header DIFAT only")
    val nTotalSects = nDataSects + nFatSects

    val fat = Array.fill(nFatSects * 128)(FREESECT)
    def markChain(start: Int, n: Int): Unit = {
      var j = 0
      while (j < n) {
        fat(start + j) = if (j == n - 1) ENDOFCHAIN else start + j + 1
        j += 1
      }
    }
    markChain(dirStart, nDirSects)
    if (nMiniFatSects > 0) markChain(miniFatStart, nMiniFatSects)
    if (nMiniStreamSects > 0) markChain(miniStreamStart, nMiniStreamSects)
    largeStarts.zip(largeSects).foreach { case (s, n) => markChain(s, n) }
    var j = 0
    while (j < nFatSects) { fat(fatStart + j) = FATSECT; j += 1 }

    // directory
    val dir = new Array[Byte](nDirSects * SectorSize)
    java.util.Arrays.fill(dir, 0.toByte)
    def wu16(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def wu32(b: Array[Byte], o: Int, v: Long): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def entry(idx: Int, name: String, objType: Int, start: Int, size: Long,
              child: Int, left: Int, right: Int): Unit = {
      val off = idx * 128
      val nm = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      require(nm.length <= 62, s"name too long: $name")
      System.arraycopy(nm, 0, dir, off, nm.length)
      wu16(dir, off + 64, nm.length + 2)
      dir(off + 66) = objType.toByte
      dir(off + 67) = 1 // black
      wu32(dir, off + 68, left & 0xffffffffL)
      wu32(dir, off + 72, right & 0xffffffffL)
      wu32(dir, off + 76, child & 0xffffffffL)
      wu32(dir, off + 116, start & 0xffffffffL)
      wu32(dir, off + 120, size)
    }
    // a left-leaning sibling list keeps the tree trivially valid:
    // entry i's left sibling is i+1 (or none), the root's child is 1
    val none = -1
    entry(0, "Root Entry", 5,
      if (nMiniStreamSects > 0) miniStreamStart else ENDOFCHAIN,
      miniStream.length.toLong, if (streams.nonEmpty) 1 else none, none, none)
    var idx = 1
    val largeMap = large.map(_._1).zip(largeStarts).toMap
    for ((name, data) <- streams) {
      val start =
        if (data.length >= MiniCutoff) largeMap(name)
        else if (data.length > 0) miniOffsets(name)
        else ENDOFCHAIN
      entry(idx, name, 2, start, data.length.toLong,
        none, if (idx < streams.length) idx + 1 else none, none)
      idx += 1
    }

    // header
    val out = new Array[Byte](SectorSize + nTotalSects * SectorSize)
    System.arraycopy(Magic, 0, out, 0, 8)
    wu16(out, 24, 0x003e) // minor
    wu16(out, 26, 3)      // major
    wu16(out, 28, 0xfffe) // little-endian
    wu16(out, 30, 9)      // sector shift
    wu16(out, 32, 6)      // mini shift
    wu32(out, 44, nFatSects.toLong)
    wu32(out, 48, dirStart.toLong)
    wu32(out, 56, MiniCutoff.toLong)
    wu32(out, 60, (if (nMiniFatSects > 0) miniFatStart else ENDOFCHAIN) & 0xffffffffL)
    wu32(out, 64, nMiniFatSects.toLong)
    wu32(out, 68, ENDOFCHAIN & 0xffffffffL) // no DIFAT sectors
    wu32(out, 72, 0L)
    var d = 0
    while (d < 109) {
      wu32(out, 76 + 4 * d,
        (if (d < nFatSects) fatStart + d else FREESECT) & 0xffffffffL)
      d += 1
    }

    def sectorOff(s: Int): Int = SectorSize + s * SectorSize
    System.arraycopy(dir, 0, out, sectorOff(dirStart), dir.length)
    if (nMiniFatSects > 0) {
      val mfb = new Array[Byte](nMiniFatSects * SectorSize)
      var m = 0
      while (m < miniFat.length) { wu32(mfb, 4 * m, miniFat(m) & 0xffffffffL); m += 1 }
      System.arraycopy(mfb, 0, out, sectorOff(miniFatStart), mfb.length)
    }
    if (nMiniStreamSects > 0)
      System.arraycopy(miniStream, 0, out, sectorOff(miniStreamStart), miniStream.length)
    for (((name, data), s) <- large.zip(largeStarts))
      System.arraycopy(data, 0, out, sectorOff(s), data.length)
    val fatBytes = new Array[Byte](nFatSects * SectorSize)
    var f = 0
    while (f < fat.length) { wu32(fatBytes, 4 * f, fat(f) & 0xffffffffL); f += 1 }
    System.arraycopy(fatBytes, 0, out, sectorOff(fatStart), fatBytes.length)
    out
  }
}
