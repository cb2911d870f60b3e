package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the PQ asymmetric distance (ADC) between an
  * exact query vector and a corpus row's m codebook codes — the inner-loop
  * kernel of the p52/p62/p64 ANN scans, where every (candidate × query)
  * pair pays m·subDim multiply-adds.
  *
  * Replaces the per-subspace `aggregate`+`zip_with` folds over
  * `element_at(typedLit(codebook), code + 1)` — interpreted lambdas per
  * element, and one codebook literal per subspace in the plan — with one
  * generated call over a single codebooks literal (`m × k × subDim`
  * doubles as a reference object; plan size O(1) in every dimension).
  *
  * Bit-compatible with the HOF formulation: per subspace, squared L2 of
  * (query slice − codebook row) accumulated left-to-right in double
  * (floats promoted), rounded to 6 dp with the engine's HALF_UP-on-
  * decimal-string contract; subspace terms then sum in subspace order and
  * round once more — exactly `round(d0 + d1 + …, 6)`. A null query
  * element nulls the whole distance (the HOF fold's null propagation), so
  * degenerate rows drop out of the bounded top-k the same way. OpsSpec
  * pins the equivalence.
  */
case class AdcDistance(qvec: Expression, codes: Expression, booksExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = qvec
  override def second: Expression = codes
  override def third: Expression = booksExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = qvec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val cOk = codes.dataType match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    val bOk = booksExpr.foldable && (booksExpr.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _                                                    => false
    })
    if (qOk && cOk && bOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "adc_distance expects (ARRAY<FLOAT|DOUBLE> qvec, ARRAY<INT> codes, " +
        "foldable ARRAY<ARRAY<ARRAY<DOUBLE>>> codebooks); got " +
        s"(${qvec.dataType}, ${codes.dataType}, ${booksExpr.dataType})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val books: Array[Array[Array[Double]]] = {
    val arr = booksExpr.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { j =>
      val sub = arr.getArray(j)
      Array.tabulate(sub.numElements())(c => sub.getArray(c).toDoubleArray())
    }
  }

  @transient private lazy val subDim: Int = books(0)(0).length

  private def qIsDouble: Boolean =
    qvec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  private def round6(d: Double): Double =
    Round6(d) // == BigDecimal HALF_UP at scale 6, NaN/Inf pass-through

  /** The kernel; returns null (boxed) on a null/short query element or a
    * null/out-of-range code — the HOF fold's null propagation.
    */
  def kernel(q: ArrayData, cs: ArrayData, isDouble: Boolean): java.lang.Double = {
    val m = books.length
    if (cs.numElements() < m || q.numElements() < m * subDim) return null
    var total = 0.0
    var j = 0
    while (j < m) {
      if (cs.isNullAt(j)) return null
      val code = cs.getInt(j)
      if (code < 0 || code >= books(j).length) return null
      val row = books(j)(code)
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val at = j * subDim + i
        if (q.isNullAt(at)) return null
        val x = if (isDouble) q.getDouble(at) else q.getFloat(at).toDouble
        val diff = x - row(i)
        d += diff * diff
        i += 1
      }
      total += round6(d)
      j += 1
    }
    java.lang.Double.valueOf(round6(total))
  }

  override def eval(input: InternalRow): Any = {
    val q = qvec.eval(input)
    val cs = codes.eval(input)
    if (q == null || cs == null) null
    else kernel(q.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData], qIsDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val qc = qvec.genCode(ctx)
    val cc = codes.genCode(ctx)
    val self = ctx.addReferenceObj("adcDistance", this, classOf[AdcDistance].getName)
    val boxed = ctx.freshName("boxed")
    ev.copy(code =
      code"""
        |${qc.code}
        |${cc.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${qc.isNull} && !${cc.isNull}) {
        |  java.lang.Double $boxed = $self.kernel(${qc.value}, ${cc.value}, $qIsDouble);
        |  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(qvec = newFirst, codes = newSecond, booksExpr = newThird)

  override def prettyName: String = "adc_distance"
}

object AdcDistance {

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "adc_distance", exprs => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"adc_distance expects 3 arguments, got ${exprs.length}")
        AdcDistance(exprs(0), exprs(1), exprs(2))
      }, "built-in")

  /** Column-level entry: the codebooks travel as one typed literal. */
  def apply(spark: org.apache.spark.sql.SparkSession,
            qvec: org.apache.spark.sql.Column,
            codes: org.apache.spark.sql.Column,
            books: Array[Array[Array[Double]]]): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("adc_distance", qvec, codes,
      org.apache.spark.sql.functions.typedlit[Seq[Seq[Seq[Double]]]](
        books.map(_.map(_.toSeq).toSeq).toSeq))
  }
}
