package graft.ops

/** Close-safe wrappers over `java.nio.file.Files.list`/`walk`: both
  * return OS directory streams that hold a file descriptor until closed,
  * so every call site that does `.iterator().asScala.toSeq` without a
  * `finally close()` leaks one descriptor per call on the driver —
  * harmless once, fatal under bench iteration / long-running streaming
  * ingest. All driver-side listing in the repo routes through here
  * (ADVICE r11: the materialize-and-close discipline, applied globally).
  */
object Fs {

  import scala.jdk.CollectionConverters._

  /** Immediate children of `p`, materialized, stream closed. */
  def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  /** Recursive walk under `p` (including `p`), materialized, closed. */
  def walkAll(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.walk(p)
    try s.iterator().asScala.toList finally s.close()
  }

  /** Delete `p` and everything under it (children first). */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    walkAll(p).sortBy(-_.getNameCount)
      .foreach(java.nio.file.Files.deleteIfExists(_))
}
