package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: indices of the `nprobe` nearest centroids
  * to a vector, nearest first, ties broken by lower cell index.
  *
  * This replaces the HOF formulation (an `array()` of k
  * `zip_with`+`aggregate` struct entries fed to `array_sort`) whose
  * expression TREE is O(k·dim) nodes — fine at the k=8 fixture scale, but
  * at the corpus-adaptive cell counts real IVF needs (k grows with n, see
  * SemDeDup) a multi-thousand-node tree stalls analysis/codegen long
  * before any row is read (measured: the sf1.0 stress with k=80 spent
  * minutes in planning). Here the centroid matrix rides along as ONE
  * `Literal` child and is handed to generated code as a reference object,
  * so plan size and compile time are O(1) in k and the per-row kernel is
  * two tight loops.
  *
  * Semantics are bit-compatible with the HOF version for the equal-length
  * vectors this engine stores: squared L2 accumulated left-to-right in
  * double (floats promoted), rounded to 6 places with the engine's
  * HALF_UP-on-decimal-string contract (`java.math.BigDecimal.valueOf`),
  * then (distance, index) lexicographic selection.
  */
case class NearestCells(vec: Expression, centsExpr: Expression, nprobeExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = centsExpr
  override def third: Expression = nprobeExpr

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    val centsOk = centsExpr.foldable && (centsExpr.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _                                      => false
    })
    val nprobeOk = nprobeExpr.foldable && nprobeExpr.dataType == IntegerType
    if (vecOk && centsOk && nprobeOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_cells expects (ARRAY<FLOAT|DOUBLE> vec, foldable ARRAY<ARRAY<DOUBLE>> centroids, " +
        s"foldable INT nprobe); got (${vec.dataType}, ${centsExpr.dataType}, ${nprobeExpr.dataType})")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = vec.nullable

  @transient private lazy val cents: Array[Array[Double]] = {
    val arr = centsExpr.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toDoubleArray()
    }
  }

  @transient private lazy val nprobe: Int =
    nprobeExpr.eval(null).asInstanceOf[Int]

  private def vecIsDouble: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  /** The kernel, shared verbatim by eval and the generated code's
    * reference-object call: selection happens here so codegen stays a
    * single static-shaped call site.
    */
  def kernel(v: ArrayData, isDouble: Boolean): ArrayData = {
    val k = cents.length
    val m = math.min(nprobe, k)
    val bestD = Array.fill(m)(Double.MaxValue)
    val bestI = Array.fill(m)(Int.MaxValue)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d2 = 0.0
      var j = 0
      while (j < n) {
        val x = if (v.isNullAt(j)) 0.0
                else if (isDouble) v.getDouble(j) else v.getFloat(j).toDouble
        val diff = x - cent(j)
        d2 += diff * diff
        j += 1
      }
      val r = Round6(d2) // == BigDecimal HALF_UP at scale 6 (Round6Spec)
      // insertion keeping (d, i) lexicographic; iterating i ascending means
      // strict < preserves the lower index on rounded ties
      var p = m
      while (p > 0 && r < bestD(p - 1)) p -= 1
      if (p < m) {
        var q = m - 1
        while (q > p) { bestD(q) = bestD(q - 1); bestI(q) = bestI(q - 1); q -= 1 }
        bestD(p) = r; bestI(p) = c
      }
      c += 1
    }
    new GenericArrayData(bestI.map(i => i: Any))
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else kernel(v.asInstanceOf[ArrayData], vecIsDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vc = vec.genCode(ctx)
    val self = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    ev.copy(code =
      code"""
        |${vc.code}
        |boolean ${ev.isNull} = ${vc.isNull};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $self.kernel(${vc.value}, $vecIsDouble);
        |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vec = newFirst, centsExpr = newSecond, nprobeExpr = newThird)

  override def prettyName: String = "nearest_cells"
}

object NearestCells {

  /** Register `nearest_cells(vec, centroids, nprobe)` as a session SQL
    * function (the public route to a custom Expression in Spark 4).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nearest_cells", exprs => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"nearest_cells expects 3 arguments, got ${exprs.length}")
        NearestCells(exprs(0), exprs(1), exprs(2))
      }, "built-in")

  /** Column-level entry: the centroid matrix travels as one typed literal. */
  def apply(spark: org.apache.spark.sql.SparkSession,
            vec: org.apache.spark.sql.Column,
            cents: Array[Array[Double]], nprobe: Int)
      : org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("nearest_cells", vec,
      org.apache.spark.sql.functions.typedlit[Seq[Seq[Double]]](
        cents.map(_.toSeq).toSeq),
      org.apache.spark.sql.functions.lit(nprobe))
  }
}
