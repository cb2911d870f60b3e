package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the random-hyperplane (SimHash) LSH
  * signature of a vector — `nBits` sign bits of projections onto a fixed
  * weight matrix, as a '0'/'1' string (the bucket key format the
  * `p13`/`p15` oracles embed verbatim).
  *
  * Replaces the HOF formulation (one `aggregate`+`zip_with` fold PER BIT,
  * interpreted per element — nBits·dim lambda invocations per row) with a
  * two-loop kernel behind one generated call; the weight matrix rides
  * along as a single `Literal` child, so plan size is O(1) in nBits, same
  * as [[NearestCells]].
  *
  * Bit-compatible with the HOF version: each projection is the
  * left-to-right fold Σ x_i·w_i in double (floats promoted), bit = '1'
  * iff proj >= 0 — a NaN projection or a null element (which nulls the
  * whole HOF fold) yields '0', exactly like `when(proj >= 0, 1)
  * .otherwise(0)` on a null/NaN input. A NULL input *vector* likewise
  * yields the all-'0' signature (every projection is null → every bit
  * takes the `otherwise(0)` branch), so the expression is never null.
  * OpsSpec pins the equivalence against the retained HOF formulation,
  * null vector included.
  */
case class HyperplaneSig(vec: Expression, weightsExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = weightsExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val wOk = weightsExpr.foldable && (weightsExpr.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _                                      => false
    })
    if (vecOk && wOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hyperplane_sig expects (ARRAY<FLOAT|DOUBLE> vec, foldable ARRAY<ARRAY<DOUBLE>> weights); " +
        s"got (${vec.dataType}, ${weightsExpr.dataType})")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  @transient private lazy val weights: Array[Array[Double]] = {
    val arr = weightsExpr.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toDoubleArray())
  }

  private def vecIsDouble: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  /** The kernel, shared by eval and generated code (reference-object call).
    * A vector whose length differs from the hyperplane dimension yields
    * the all-'0' signature: the HOF baseline's `zip_with` null-pads the
    * shorter side, which nulls every projection — length mismatch means
    * "no defined bucket", not the sign of a partial projection.
    */
  def kernel(v: ArrayData, isDouble: Boolean): UTF8String = {
    val bits = new Array[Byte](weights.length)
    val dim = if (weights.isEmpty) 0 else weights(0).length
    val ragged = v.numElements() != dim
    var b = 0
    while (b < weights.length) {
      val w = weights(b)
      var proj = 0.0
      var sawNull = ragged || w.length != dim
      var j = 0
      while (j < dim && !sawNull) {
        if (v.isNullAt(j)) sawNull = true
        else {
          val x = if (isDouble) v.getDouble(j) else v.getFloat(j).toDouble
          proj += x * w(j)
        }
        j += 1
      }
      bits(b) = if (!sawNull && proj >= 0) '1'.toByte else '0'.toByte
      b += 1
    }
    UTF8String.fromBytes(bits)
  }

  /** Signature of a NULL vector: every projection nulls, every bit '0'. */
  def allZeroSig: UTF8String =
    UTF8String.fromBytes(Array.fill[Byte](weights.length)('0'.toByte))

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) allZeroSig else kernel(v.asInstanceOf[ArrayData], vecIsDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vc = vec.genCode(ctx)
    val self = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSig].getName)
    ev.copy(code =
      code"""
        |${vc.code}
        |boolean ${ev.isNull} = false;
        |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        |  ${vc.isNull} ? $self.allZeroSig() : $self.kernel(${vc.value}, $vecIsDouble);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, weightsExpr = newRight)

  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_sig", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"hyperplane_sig expects 2 arguments, got ${exprs.length}")
        HyperplaneSig(exprs(0), exprs(1))
      }, "built-in")

  /** Column-level entry: the weight matrix travels as one typed literal. */
  def apply(spark: org.apache.spark.sql.SparkSession,
            vec: org.apache.spark.sql.Column,
            weights: Array[Array[Double]]): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("hyperplane_sig", vec,
      org.apache.spark.sql.functions.typedlit[Seq[Seq[Double]]](
        weights.map(_.toSeq).toSeq))
  }
}
