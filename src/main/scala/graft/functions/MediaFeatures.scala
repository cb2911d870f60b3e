package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SQL surface for the multimodal decode dispatch
  * ([[graft.ops.Multimodal.decode]]): a SQL-first deployment featurizes a
  * `BINARY` media column without touching the DataFrame API —
  *
  * {{{
  * SELECT doc_id, media_features(media) AS f, media_kind(media) AS kind
  * FROM corpus
  * }}}
  *
  * Both are real `Expression`s with `doGenCode` (a reference-object call —
  * the decode itself is codec work, not arithmetic to inline), so they
  * live inside whole-stage codegen with no UDF boundary and no Janino
  * fallback (CodegenSweepSpec's contract). Per-partition decoder setup
  * (the `mapPartitions` batching in `Multimodal.extractFeatures`) is the
  * scale path for dedicated pipelines; this expression is the ergonomic
  * path for ad-hoc SQL over the same bytes, and the two produce identical
  * features (spec-pinned).
  */
case class MediaFeatures(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_features expects BINARY, got $other")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  def kernel(bytes: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(graft.ops.Multimodal.decode(bytes))

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mediaFeatures", this,
      classOf[MediaFeatures].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MediaFeatures =
    copy(child = newChild)

  override def prettyName: String = "media_features"
}

object MediaFeatures {

  /** Register `media_features(b)` as a session SQL function — the
    * ergonomic route for sessions built without [[graft.GraftExtensions]]
    * (same pattern as [[CosineSim.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "media_features", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"media_features expects 1 argument, got ${exprs.length}")
        MediaFeatures(exprs(0))
      }, "built-in")

  def apply(spark: org.apache.spark.sql.SparkSession,
            media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("media_features", media)
  }
}

/** Which real decoder claims the bytes — 'image' (ImageIO), 'audio'
  * (javax.sound PCM), 'flac' (native FLAC), 'companded' (native
  * G.711/ADPCM WAV), 'video' (native uncompressed AVI), 'rle_video'
  * (native BI_RLE8 compressed AVI), 'mjpeg_video' (DCT-compressed MJPEG
  * AVI through the real ImageIO JPEG codec) or 'stub' (nothing here
  * decodes it). The SQL predicate for routing a mixed media column to
  * per-modality pipelines.
  */
case class MediaKind(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_kind expects BINARY, got $other")
  }

  override def dataType: DataType = StringType

  def kernel(bytes: Array[Byte]): UTF8String =
    UTF8String.fromString(graft.ops.Multimodal.decodeWithKind(bytes)._1)

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mediaKind", this, classOf[MediaKind].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MediaKind =
    copy(child = newChild)

  override def prettyName: String = "media_kind"
}

/** One-pass decode for queries that want routing AND features:
  * `media_decode(b)` → `STRUCT<kind STRING, features ARRAY<FLOAT>>`.
  * `SELECT media_kind(b), media_features(b)` runs the full codec dispatch
  * twice per row (two independent expressions — Spark's subexpression
  * elimination only merges identical trees); this expression runs it
  * once, and the struct fields prune like any other.
  */
case class MediaDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_decode expects BINARY, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  def kernel(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val (kind, feats) = graft.ops.Multimodal.decodeWithKind(bytes)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(kind),
        UnsafeArrayData.fromPrimitiveArray(feats)))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mediaDecode", this, classOf[MediaDecode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MediaDecode =
    copy(child = newChild)

  override def prettyName: String = "media_decode"
}

object MediaDecode {

  /** Register `media_decode(b)` as a session SQL function (see
    * [[MediaFeatures.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "media_decode", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"media_decode expects 1 argument, got ${exprs.length}")
        MediaDecode(exprs(0))
      }, "built-in")

  def apply(spark: org.apache.spark.sql.SparkSession,
            media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("media_decode", media)
  }
}

object MediaKind {

  /** Register `media_kind(b)` as a session SQL function (see
    * [[MediaFeatures.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "media_kind", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"media_kind expects 1 argument, got ${exprs.length}")
        MediaKind(exprs(0))
      }, "built-in")

  def apply(spark: org.apache.spark.sql.SparkSession,
            media: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("media_kind", media)
  }
}
