package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string.
  *
  * The first transform of any large-scale text-ingest pipeline — the same
  * logical text arrives in composed ("á") and decomposed ("a" + U+0301)
  * forms, and every downstream exact-dedup digest, shingle, and token
  * boundary disagrees between them unless the corpus is canonicalized
  * first. Spark has no built-in for this (DuckDB ships `nfc_normalize`);
  * a Scala UDF would pay the serialization boundary on 100 TB of text.
  *
  * Implemented over the JDK's `java.text.Normalizer` (ICU-equivalent for
  * NFC, no new dependency) with `doGenCode`, so the call stays inside
  * whole-stage codegen next to the digest/tokenize expressions it feeds.
  * A quick-check fast path (`Normalizer.isNormalized`) skips the copy for
  * the common all-ASCII / already-composed case — that check is O(n) with
  * no allocation, while `normalize` always allocates.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got $dt")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static kernel shared by interpreted and generated paths (the generated
    * code calls it by name — one branch + one JDK call, nothing worth
    * inlining into Java source).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Register `nfc_normalize(s)` as a session SQL function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"nfc_normalize expects 1 argument, got ${exprs.length}")
        NfcNormalize(exprs(0))
      }, "built-in")

  /** Column-level entry point (same route as [[CosineSim.apply]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            s: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("nfc_normalize", s)
  }
}
