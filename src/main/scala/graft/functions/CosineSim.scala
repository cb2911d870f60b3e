package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two numeric arrays.
  *
  * The hot kernel of every ANN/near-dup operator, written as a real
  * `Expression` with `doGenCode` — a primitive `for` loop over `ArrayData`
  * that lives INSIDE whole-stage codegen: no UDF boundary, no per-element
  * lambda interpretation (the `aggregate`/`zip_with` higher-order-function
  * formulation interprets its lambdas), no unrolling limit (the fixed-dim
  * unrolled kernel tops out when generated methods hit JIT limits).
  *
  * Semantics: elements pair up to the shorter length; null elements count
  * as 0; result is `dot / (|a|·|b|)` in double — NaN when either norm is 0,
  * matching the float→double promotion and left-fold summation order of
  * the other kernels bit-for-bit, so oracle hashes are unchanged.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects ARRAY<FLOAT|DOUBLE> args, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    val aDouble = elemType(left) == DoubleType
    val bDouble = elemType(right) == DoubleType
    val n = math.min(aa.numElements(), bb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aa.isNullAt(i)) 0.0 else if (aDouble) aa.getDouble(i) else aa.getFloat(i).toDouble
      val y = if (bb.isNullAt(i)) 0.0 else if (bDouble) bb.getDouble(i) else bb.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, i: String, e: Expression): String =
        if (elemType(e) == DoubleType) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : ${get(a, i, left)};
         |  double $y = $b.isNullAt($i) ? 0.0 : ${get(b, i, right)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {

  /** Register `cosine_sim(a, b)` as a session SQL function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSim(exprs(0), exprs(1))
      }, "built-in")

  /** Column-level entry point: registers on first use in the session, then
    * resolves through the function registry (the public route to a custom
    * Expression in Spark 4's unified Column API).
    */
  def apply(spark: org.apache.spark.sql.SparkSession,
            a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  }
}
