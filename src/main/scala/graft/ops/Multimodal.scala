package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed batch-wise in `mapPartitions`.
  *
  * The actual codecs (JPEG decode, audio resample, video frame extraction)
  * are NOT in this container, so the decode step is a clearly-marked
  * deterministic STUB — but everything Spark-side is real and load-bearing:
  * the schema contract, the partition-wise batch loop that would amortize a
  * native decoder's setup cost, the fixed-shape feature output, and the
  * downstream joinability of the result. Swapping `stubDecode` for a real
  * codec changes no plumbing.
  *
  * Scale design: decode is the classic CPU-heavy embarrassingly-parallel
  * stage — `mapPartitions` keeps it shuffle-free on top of the scan, and the
  * fixed-width output schema keeps Tungsten row size predictable at 100 TB.
  */
object Multimodal {

  final val FeatureDim = 8

  /** Typed metadata for an opaque media blob. */
  final case class MediaMeta(format: String, nBytes: Long, checksum: Long)

  /** STUB for a real media decoder: deterministic fixed-shape "features"
    * derived from the bytes (a real implementation would JPEG-decode and
    * pool pixels here). Marked ??? -equivalent by design; the surrounding
    * plumbing is the product.
    */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, bytes.length / FeatureDim)
    var j = 0
    while (j < FeatureDim) { out(j) /= n; j += 1 }
    out
  }

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** (id, media BINARY) → (id, format, n_bytes, checksum, features ARRAY<FLOAT>).
    * One decoder per partition (where a native codec would be initialized
    * once), rows processed in a tight loop.
    */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String,
                      format: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", LongType),
      StructField("features", ArrayType(FloatType))))
    val rdd = df.select(col(idCol).cast("long"), col(mediaCol)).rdd.mapPartitions { it =>
      // real codec init would happen once here (per partition, not per row)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, format, if (bytes == null) 0L else bytes.length.toLong,
          if (bytes == null) 0L else fnv64(bytes), stubDecode(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Video" frame sampling over an opaque blob: emit every k-th fixed-size
    * chunk as a frame row (id, frame_idx, frame BINARY). The chunking stands
    * in for keyframe extraction; the explode-shape (one input row → many
    * frame rows, no shuffle) is the real contract.
    */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
                   frameBytes: Int, everyK: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val rdd = df.select(col(idCol).cast("long"), col(mediaCol)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else {
          val nChunks = bytes.length / frameBytes
          (0 until nChunks by everyK).iterator.map { c =>
            Row(id, c, java.util.Arrays.copyOfRange(bytes, c * frameBytes, (c + 1) * frameBytes))
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
