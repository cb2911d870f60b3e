package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `robots_match(rule, path)` → BOOLEAN: does an RFC 9309 rule (literal
  * prefix, `*` wildcards, trailing-`$` anchor) cover a path? The LINEAR
  * matcher behind [[graft.ops.Robots.applyRobots]] and the streaming
  * verdict stage. The previous spelling compiled each rule's `*`s to
  * `.*` and evaluated `path rlike rx` per page — a hostile rule
  * stacking many wildcards (`…a*a*a*…$`) in an UNTRUSTED robots.txt backtracks
  * catastrophically in Java's regex engine, a CPU denial-of-service
  * vector in the ingest path (ADVICE r11). This expression runs the
  * greedy two-pointer wildcard match — O(|rule|·|path|) worst case, no
  * backtracking blowup — and whole-stage-codegens like any builtin.
  * Semantics are pinned differential-equal to both the regex translation
  * and the recursive reference walk (RobotsSpec).
  */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_match expects (STRING, STRING), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(l: Any, r: Any): Any =
    RobotsMatch.kernel(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.RobotsMatch.kernel($l, $r);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)

  override def prettyName: String = "robots_match"
}

object RobotsMatch {

  def kernel(rule: UTF8String, path: UTF8String): Boolean =
    graft.ops.Robots.ruleMatches(rule.toString, path.toString)

  /** Register `robots_match(rule, path)` as a session SQL function (the
    * [[MediaFeatures]] pattern) so it is usable inside HOF lambdas.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "robots_match", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"robots_match expects 2 arguments, got ${exprs.length}")
        RobotsMatch(exprs(0), exprs(1))
      }, "built-in")

  def apply(spark: org.apache.spark.sql.SparkSession,
            rule: org.apache.spark.sql.Column,
            path: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("robots_match", rule, path)
  }
}
