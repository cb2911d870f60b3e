package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** Session parser adding the host-dialect shims (see [[Qualify]]): the
  * QUALIFY clause, DISTINCT ON, the `* EXCLUDE (...)` star modifier, the
  * `struct_pack(k := v)` struct constructor, and `CREATE MACRO` with
  * inline-at-parse-time call expansion. Installed by GraftExtensions via
  * injectParser. Statements are handed to the stock parser untouched unless
  * they mention a shimmed keyword or a registered macro; if the rewrite —
  * or the parse of the rewritten text — fails, the original text is parsed
  * instead, so a schema that merely uses `qualify`/`exclude` as an
  * identifier keeps working.
  */
class QualifyParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def withQualify(text: String, parse: String => LogicalPlan): LogicalPlan = {
    Qualify.parseCreateMacro(text).foreach { m =>
      Qualify.registerMacro(session, m)
      // the DDL itself parses to a one-row acknowledgement, like the host
      // engine's statement-ok result
      return parse("SELECT true AS ok")
    }
    Qualify.parseCopy(text).foreach { spec =>
      // the inner query is kept as text; CopyToFile.run re-enters
      // session.sql at execution, so it receives the full shim treatment
      // (macros registered by then included)
      return CopyToFileCommand(spec)
    }
    Qualify.parseInstallLoad(text).foreach { case (verb, ext) =>
      Qualify.applyInstallLoad(session, verb, ext)
      return parse("SELECT true AS ok")
    }
    Qualify.parseSetTiles(text).foreach { path =>
      // the host's setting write callback loads eagerly on SET
      Qualify.applySetTiles(session, path)
      return parse("SELECT true AS ok")
    }
    val macros = Qualify.macrosOf(session)
    val lower = text.toLowerCase
    val mentionsShim = lower.contains("qualify") || lower.contains("exclude") ||
      lower.contains("distinct") || lower.contains("struct_pack") ||
      lower.contains("::") || lower.contains("[") ||
      (lower.contains("using") && lower.contains("sample"))
    val mentionsMacro = macros.nonEmpty && macros.keysIterator.exists(lower.contains)
    if (!mentionsShim && !mentionsMacro) return parse(text)
    val rewritten =
      try Qualify.dialect(Qualify.expandMacros(text, macros))
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
