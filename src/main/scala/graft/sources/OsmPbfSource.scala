package graft.sources

import graft.graph.OsmPbf
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}

/** DataSource V2 for OSM PBF files:
  *
  * {{{
  * spark.read.format("graft.sources.OsmPbfSource")
  *   .option("kind", "nodes" | "ways")   // default "nodes"
  *   .load("s3a://bucket/region.osm.pbf")
  * }}}
  *
  * Scale shape — the property the RDD path (OsmPbf.read) approximates but
  * cannot reach: planning scans ONLY the blob framing (type + offset +
  * length; a few hundred bytes per ~8 MB blob), so the driver never holds
  * payload bytes at all; each executor partition re-opens the file through
  * Hadoop FileSystem, seeks to its own blobs, and inflates + decodes there.
  * A planet file plans in MBs of driver memory and reads at cluster width.
  *
  * Schemas: nodes(id BIGINT, lat DOUBLE, lon DOUBLE);
  * ways(way_id BIGINT, highway STRING, oneway BOOLEAN, node_ids ARRAY<BIGINT>).
  */
class OsmPbfSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmPbfSource.schemaFor(options.getOrDefault("kind", "nodes"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new OsmPbfTable(properties.get("path"),
      Option(properties.get("kind")).getOrElse("nodes"))
}

object OsmPbfSource {
  final val Format = "graft.sources.OsmPbfSource"

  def schemaFor(kind: String): StructType = kind match {
    case "nodes" => StructType(Seq(
      StructField("id", LongType), StructField("lat", DoubleType),
      StructField("lon", DoubleType)))
    case "ways" => StructType(Seq(
      StructField("way_id", LongType), StructField("highway", StringType),
      StructField("oneway", BooleanType),
      StructField("node_ids", ArrayType(LongType))))
    case other => throw new IllegalArgumentException(
      s"kind must be 'nodes' or 'ways', got '$other'")
  }

  /** (offset, length) of every OSMData blob — framing WITHOUT payloads:
    * headers are read, payload bytes are skipped.
    */
  def frameOffsets(conf: org.apache.hadoop.conf.Configuration,
                   path: String): Seq[(Long, Int)] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      hPath.getFileSystem(conf).open(hPath)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    var pos = 0L
    try {
      var done = false
      while (!done) {
        val headerLen =
          try in.readInt()
          catch { case _: java.io.EOFException => done = true; -1 }
        if (!done) {
          val headerBytes = new Array[Byte](headerLen); in.readFully(headerBytes)
          // minimal BlobHeader walk: type (1, len-delim), datasize (3, varint)
          var blobType = ""; var dataSize = 0
          var p = 0
          def varint(): Long = {
            var shift = 0; var res = 0L
            var b = 0
            while ({ b = headerBytes(p); p += 1; res |= (b & 0x7fL) << shift; (b & 0x80) != 0 })
              shift += 7
            res
          }
          while (p < headerLen) {
            val tag = varint()
            val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
            (field, wire) match {
              case (1, 2) =>
                val len = varint().toInt
                blobType = new String(headerBytes, p, len,
                  java.nio.charset.StandardCharsets.UTF_8)
                p += len
              case (3, 0) => dataSize = varint().toInt
              case (_, 0) => varint()
              case (_, 2) => val len = varint().toInt; p += len
              case (_, 5) => p += 4
              case (_, 1) => p += 8
              case other => throw new IllegalArgumentException(s"wire $other")
            }
          }
          val blobStart = pos + 4 + headerLen
          if (blobType == "OSMData") out += ((blobStart, dataSize))
          // skipBytes is best-effort (remote streams may return 0 mid-file);
          // loop, falling back to single-byte reads, and fail loudly on a
          // truncated file instead of desynchronizing every later offset
          var toSkip = dataSize
          while (toSkip > 0) {
            val s = in.skipBytes(toSkip)
            if (s > 0) toSkip -= s
            else { in.readByte(); toSkip -= 1 } // throws EOFException if truncated
          }
          pos = blobStart + dataSize
        }
      }
    } finally in.close()
    out.toSeq
  }
}

final class OsmPbfTable(path: String, kind: String) extends Table with SupportsRead {
  require(path != null, "path option is required")
  override def name(): String = s"osmpbf:$kind:$path"
  override def schema(): StructType = OsmPbfSource.schemaFor(kind)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OsmPbfScanBuilder(path, kind)
}

final class OsmPbfScanBuilder(path: String, kind: String) extends ScanBuilder {
  override def build(): Scan = new OsmPbfScan(path, kind)
}

/** One input partition = a contiguous run of blob (offset, length) spans. */
final case class OsmPbfPartition(path: String, kind: String,
                                 offsets: Array[Long], lengths: Array[Int])
    extends InputPartition

/** Java-serializable Hadoop-conf carrier (Configuration is Writable but not
  * Serializable): ships the SESSION conf to executor readers so remote
  * filesystems keep their credentials/settings (s3a keys, endpoints).
  */
final class SerializableHadoopConf(
    @transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(new java.io.DataOutputStream(out))
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(new java.io.DataInputStream(in))
  }
}

final class OsmPbfScan(path: String, kind: String) extends Scan with Batch {
  override def readSchema(): StructType = OsmPbfSource.schemaFor(kind)
  override def toBatch: Batch = this

  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  // framed once per Scan: re-planning (multiple actions, AQE) must not
  // re-run the sequential driver pass over a possibly-remote file
  private lazy val framed = OsmPbfSource.frameOffsets(conf.value, path)

  override def planInputPartitions(): Array[InputPartition] = {
    val blobs = framed
    // ~64 MB of compressed payload per partition, at least one blob each
    val target = 64L << 20
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    var offs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lens = scala.collection.mutable.ArrayBuffer.empty[Int]
    var acc = 0L
    blobs.foreach { case (o, l) =>
      offs += o; lens += l; acc += l
      if (acc >= target) {
        parts += OsmPbfPartition(path, kind, offs.toArray, lens.toArray)
        offs = scala.collection.mutable.ArrayBuffer.empty[Long]
        lens = scala.collection.mutable.ArrayBuffer.empty[Int]
        acc = 0L
      }
    }
    if (offs.nonEmpty) parts += OsmPbfPartition(path, kind, offs.toArray, lens.toArray)
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OsmPbfReaderFactory(conf)
}

final class OsmPbfReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OsmPbfPartitionReader(partition.asInstanceOf[OsmPbfPartition], conf)
}

final class OsmPbfPartitionReader(part: OsmPbfPartition, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  // executor-side: open the file, seek to OUR blobs, inflate + decode here
  private val hPath = new org.apache.hadoop.fs.Path(part.path)
  private val in = hPath.getFileSystem(conf.value).open(hPath)
  private var blobIdx = 0
  private var rows: Iterator[InternalRow] = Iterator.empty

  private def decodeNext(): Boolean = {
    while (!rows.hasNext && blobIdx < part.offsets.length) {
      val buf = new Array[Byte](part.lengths(blobIdx))
      in.readFully(part.offsets(blobIdx), buf)
      blobIdx += 1
      val payload = OsmPbf.parseBlobPayload(buf)
      val (nodes, ways) = OsmPbf.decodeBlock(payload)
      rows =
        if (part.kind == "nodes")
          nodes.iterator.map(n => InternalRow(n.id, n.lat, n.lon))
        else
          ways.iterator.map { w =>
            InternalRow(w.wayId, UTF8String.fromString(w.highway), w.oneway,
              org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
                w.nodeIds.toArray))
          }
    }
    rows.hasNext
  }

  override def next(): Boolean = rows.hasNext || decodeNext()
  override def get(): InternalRow = rows.next()
  override def close(): Unit = in.close()
}
