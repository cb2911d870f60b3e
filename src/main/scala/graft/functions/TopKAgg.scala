package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: the k smallest `(score, id)` pairs per group,
  * lexicographic (score asc, id asc), as `ARRAY<STRUCT<score, id>>`.
  *
  * Why a custom aggregate instead of the `row_number()` window: a window
  * must co-locate EVERY scored row of a group on one reducer — for a
  * brute-force ANN scan that is N rows per query through a single
  * partition. A TypedImperativeAggregate gets map-side PARTIAL
  * aggregation: each task reduces its slice to ≤ k pairs, the shuffle
  * carries at most k·tasks rows per group, and the final merge touches
  * k-sized buffers only. Same exact result (the k smallest of the union
  * is the k smallest of per-slice k-smallest), order-independent by
  * construction — the contract [[graft.ops.Similarity.hammingTopK]]'s
  * oracle checks against a DuckDB QUALIFY window.
  *
  * The buffer compacts (sort + trim) only when it exceeds `2k + 64`, so
  * per-row update cost stays amortized O(1) sorts aside.
  */
case class TopKMinPairs(
    score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"topk_min_pairs k must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", LongType, nullable = false)
    .add("id", LongType, nullable = false), containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  private def compact(buf: ArrayBuffer[(Long, Long)]): Unit =
    if (buf.length > k) {
      val kept = buf.sorted.take(k)
      buf.clear()
      buf ++= kept
    }

  override def update(buf: ArrayBuffer[(Long, Long)],
                      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Long], i.asInstanceOf[Long]))
      if (buf.length > 2 * k + 64) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
                     other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    buf ++= other
    compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.sorted.take(k).map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    compact(buf) // never ship more than k pairs
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeLong(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = ArrayBuffer.empty[(Long, Long)]
    var j = 0
    while (j < n) { buf += ((in.getLong, in.getLong)); j += 1 }
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
