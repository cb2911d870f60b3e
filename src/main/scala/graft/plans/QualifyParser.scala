package graft.plans

import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** Session parser adding the host-dialect shims (see [[Qualify]]): the
  * QUALIFY clause, DISTINCT ON, the `* EXCLUDE (...)` star modifier, and
  * the `struct_pack(k := v)` struct constructor. Installed by
  * GraftExtensions via injectParser. Statements are handed to the stock
  * parser untouched unless they mention a shimmed keyword; if the rewrite —
  * or the parse of the rewritten text — fails, the original text is parsed
  * instead, so a schema that merely uses `qualify`/`exclude` as an
  * identifier keeps working.
  */
class QualifyParser(delegate: ParserInterface) extends ParserInterface {

  private def withQualify(text: String, parse: String => LogicalPlan): LogicalPlan = {
    val lower = text.toLowerCase
    if (!lower.contains("qualify") && !lower.contains("exclude") &&
      !lower.contains("distinct") && !lower.contains("struct_pack"))
      return parse(text)
    val rewritten =
      try Qualify.dialect(text)
      catch { case _: Qualify.QualifyRewriteException => text }
    if (rewritten == text) parse(text)
    else
      try parse(rewritten)
      catch { case _: ParseException => parse(text) }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    withQualify(sqlText, delegate.parsePlan)
  override def parseQuery(sqlText: String): LogicalPlan =
    withQualify(sqlText, delegate.parseQuery)

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
