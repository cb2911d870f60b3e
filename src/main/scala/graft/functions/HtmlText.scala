package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SQL surface for HTML main-content extraction
  * ([[graft.ops.Html.extract]]):
  *
  * {{{
  * SELECT url, html_text(body).title, html_text(body).text FROM crawl
  * }}}
  *
  * `html_text(s)` → `STRUCT<title STRING, text STRING, n_kept INT,
  * n_dropped INT>`. A real `Expression` with `doGenCode` (reference-object
  * call — the extraction is a string state machine, not arithmetic to
  * inline), so it lives inside whole-stage codegen with no UDF boundary
  * and no Janino fallback (CodegenSweepSpec's contract). Stateless and
  * per-row: 100 TB of crawl HTML extracts at scan parallelism with zero
  * shuffle. Subexpression elimination merges repeated `html_text(b)`
  * trees in one projection, so selecting several struct fields runs the
  * parse once.
  */
case class HtmlText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_text expects STRING, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))

  def kernel(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val e = graft.ops.Html.extract(s.toString)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(e.title), UTF8String.fromString(e.text),
        e.nKept, e.nDropped))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("htmlText", this, classOf[HtmlText].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)

  override def prettyName: String = "html_text"
}

object HtmlText {

  /** Register `html_text(s)` as a session SQL function (same pattern as
    * [[MediaFeatures.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_text", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"html_text expects 1 argument, got ${exprs.length}")
        HtmlText(exprs(0))
      }, "built-in")

  def apply(spark: org.apache.spark.sql.SparkSession,
            html: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("html_text", html)
  }
}
