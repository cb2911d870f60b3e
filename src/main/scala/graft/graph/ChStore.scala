package graft.graph

import graft.algo.ChGraph
import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path}

/** Binary persistence for a prepared contraction hierarchy, stored next to
  * the parquet graph cache (`<dir>/<mode>/ch.bin`) — the analogue of the
  * reference persisting its prepared fast_paths graph in the `.routing`
  * cache (rust/src/lib.rs:164-166) instead of re-preparing per load.
  *
  * The file embeds a fingerprint of the base graph (node/edge counts + FNV
  * over the CSR arrays); load refuses a CH whose graph has changed, so a
  * stale cache degrades to a rebuild, never to wrong routes.
  */
object ChStore {
  private val Magic = 0x43484731 // "CHG1"

  /** FNV-1a over structural CSR arrays — cheap (one linear pass). */
  def fingerprintCsr(offsets: Array[Int], targets: Array[Int],
                     weights: Array[Int], numNodes: Int, numEdges: Int): Long = {
    var h = 0xcbf29ce484222325L
    def mix(v: Int): Unit = { h ^= (v & 0xffffffffL); h *= 0x100000001b3L }
    var i = 0
    while (i <= numNodes) { mix(offsets(i)); i += 1 }
    i = 0
    while (i < numEdges) { mix(targets(i)); mix(weights(i)); i += 1 }
    h
  }

  def fingerprint(g: PreparedGraph): Long =
    fingerprintCsr(g.offsets, g.targets, g.weightsMs, g.numNodes, g.numEdges)

  private def writeArr(out: DataOutputStream, a: Array[Int]): Unit = {
    out.writeInt(a.length)
    var i = 0
    while (i < a.length) { out.writeInt(a(i)); i += 1 }
  }

  private def readArr(in: DataInputStream): Array[Int] = {
    val n = in.readInt()
    val a = new Array[Int](n)
    var i = 0
    while (i < n) { a(i) = in.readInt(); i += 1 }
    a
  }

  /** Write a CH (stream form — works for any filesystem, incl. Hadoop FS
    * streams for tiled layouts on shared storage). Closes the stream.
    */
  def saveStream(os: java.io.OutputStream, graphFp: Long, ch: ChGraph): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(os, 1 << 16))
    try {
      out.writeInt(Magic)
      out.writeLong(graphFp)
      out.writeInt(ch.n)
      writeArr(out, ch.rank)
      writeArr(out, ch.upOff); writeArr(out, ch.upTgt); writeArr(out, ch.upW)
      writeArr(out, ch.dnOff); writeArr(out, ch.dnTgt); writeArr(out, ch.dnW)
    } finally out.close()
  }

  /** Read a CH whose stored fingerprint and node count match; None on any
    * mismatch or corruption. Closes the stream.
    */
  def loadStream(is: java.io.InputStream, graphFp: Long, numNodes: Int): Option[ChGraph] = {
    val in = new DataInputStream(new BufferedInputStream(is, 1 << 16))
    try {
      if (in.readInt() != Magic) return None
      if (in.readLong() != graphFp) return None
      val n = in.readInt()
      if (n != numNodes) return None
      val rank = readArr(in)
      val uo = readArr(in); val ut = readArr(in); val uw = readArr(in)
      val dno = readArr(in); val dnt = readArr(in); val dnw = readArr(in)
      Some(new ChGraph(n, rank, uo, ut, uw, dno, dnt, dnw))
    } catch {
      case _: java.io.IOException => None
    } finally in.close()
  }

  def save(file: Path, g: PreparedGraph, ch: ChGraph): Unit = {
    Files.createDirectories(file.getParent)
    saveStream(Files.newOutputStream(file), fingerprint(g), ch)
  }

  /** Load a CH valid for `g`; None when missing, corrupt, or stale. */
  def load(file: Path, g: PreparedGraph): Option[ChGraph] = {
    if (!Files.exists(file)) return None
    loadStream(Files.newInputStream(file), fingerprint(g), g.numNodes)
  }

  /** Attach a cached CH to `g`, or build (honoring the auto-gate) and cache
    * what was built. A cached hierarchy attaches regardless of graph size —
    * it is already paid for.
    */
  def attachOrBuild(g: PreparedGraph, file: Path): PreparedGraph = {
    if (g.ch == null) {
      load(file, g) match {
        case Some(ch) => g.ch = ch
        case None =>
          g.withCh()
          if (g.ch != null) {
            // persistence is an optimization: an unwritable cache dir
            // (read-only mount) must not fail a load that already has its CH
            try save(file, g, g.ch)
            catch {
              case e: java.io.IOException =>
                System.err.println(s"[graft] CH cache write skipped ($file): ${e.getMessage}")
            }
          }
      }
    }
    g
  }
}
