package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k aggregate: the k smallest `(score, id)` pairs per group,
  * ordered (score asc, id asc), as `ARRAY<STRUCT<score, id>>`. `id` may be
  * BIGINT or STRING; string ties compare in binary (UTF8) order — the same
  * order DuckDB's default collation gives an `ORDER BY`, so a cross-engine
  * oracle can mirror the tie-break exactly.
  *
  * Why a custom aggregate instead of the `row_number()` window: a window
  * must co-locate EVERY scored row of a group on one reducer — for a
  * brute-force ANN scan that is N rows per query through a single
  * partition; for a global vocabulary top-k it is the ENTIRE vocabulary.
  * A TypedImperativeAggregate gets map-side PARTIAL aggregation: each task
  * reduces its slice to ≤ k pairs, the shuffle carries at most k·tasks
  * rows per group, and the final merge touches k-sized buffers only. Same
  * exact result (the k smallest of the union is the k smallest of
  * per-slice k-smallest), order- and partitioning-independent by
  * construction.
  *
  * The buffer compacts (sort + trim) only when it exceeds `2k + 64`, so
  * per-row update cost stays amortized O(1) sorts aside.
  */
case class TopKMinPairs(
    score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Any)]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"topk_min_pairs k must be an integer literal, got $other")
  }

  private lazy val stringIds: Boolean = id.dataType match {
    case StringType => true
    case LongType   => false
    case other      => throw new IllegalArgumentException(
      s"topk_min_pairs id must be BIGINT or STRING, got $other")
  }

  private implicit lazy val ord: Ordering[(Long, Any)] = new Ordering[(Long, Any)] {
    override def compare(a: (Long, Any), b: (Long, Any)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c
      else if (stringIds)
        a._2.asInstanceOf[UTF8String].compareTo(b._2.asInstanceOf[UTF8String])
      else java.lang.Long.compare(a._2.asInstanceOf[Long], b._2.asInstanceOf[Long])
    }
  }

  // fail at analysis, not mid-job on an executor: a wrongly-typed score
  // would otherwise surface as an opaque ClassCastException after shuffle
  // work is already done
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
    if (score.dataType != LongType)
      TypeCheckFailure(s"topk_min_pairs score must be BIGINT, got ${score.dataType.sql}")
    else if (id.dataType != LongType && id.dataType != StringType)
      TypeCheckFailure(s"topk_min_pairs id must be BIGINT or STRING, got ${id.dataType.sql}")
    else if (!kExpr.foldable ||
      (kExpr.dataType != IntegerType && kExpr.dataType != LongType))
      TypeCheckFailure("topk_min_pairs k must be an integer literal")
    else if (k <= 0)
      TypeCheckFailure(s"topk_min_pairs k must be positive, got $k")
    else TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", LongType, nullable = false)
    .add("id", id.dataType, nullable = false), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Long, Any)] =
    ArrayBuffer.empty

  private def compact(buf: ArrayBuffer[(Long, Any)]): Unit =
    if (buf.length > k) {
      val kept = buf.sorted.take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[(Long, Any)],
                      input: InternalRow): ArrayBuffer[(Long, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // UTF8Strings handed out by eval may alias reused row buffers — copy
      val iv: Any =
        if (stringIds) i.asInstanceOf[UTF8String].clone() else i
      buf += ((s.asInstanceOf[Long], iv))
      if (buf.length > 2 * k + 64) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Any)],
                     other: ArrayBuffer[(Long, Any)]): ArrayBuffer[(Long, Any)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Any)]): Any =
    new GenericArrayData(buf.sorted.take(k).map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Any)]): Array[Byte] = {
    compact(buf) // never ship more than k pairs
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) =>
      out.writeLong(s)
      if (stringIds) {
        val b = i.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else out.writeLong(i.asInstanceOf[Long])
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Any)] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = ArrayBuffer.empty[(Long, Any)]
    var j = 0
    while (j < n) {
      val s = in.getLong
      val iv: Any =
        if (stringIds) {
          val len = in.getInt
          val b = new Array[Byte](len)
          in.get(b)
          UTF8String.fromBytes(b)
        } else in.getLong
      buf += ((s, iv))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMinPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMinPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKMinPairs =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
  override def prettyName: String = "topk_min_pairs"
}

object TopKMinPairs {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_min_pairs", exprs => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"topk_min_pairs expects 3 arguments, got ${exprs.length}")
        TopKMinPairs(exprs(0), exprs(1), exprs(2))
      }, "built-in")

  /** Column-level entry (the analyzer wraps the aggregate function). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            score: org.apache.spark.sql.Column,
            id: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("topk_min_pairs", score, id,
      org.apache.spark.sql.functions.lit(k))
  }
}
