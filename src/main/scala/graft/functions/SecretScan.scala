package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native kernel for the secret scrub ([[graft.ops.Hygiene]]):
  * `secret_scan(text)` → STRUCT<cands: ARRAY<STRING>, secrets:
  * ARRAY<STRING>> — candidate detection (length floor, machine alphabet,
  * mixed character classes) and the entropy gate in a single generated
  * call, where the HOF spelling re-materializes the token array per
  * stage and per consuming column (HOFs are CodegenFallback: no
  * whole-stage codegen, no cross-column CSE). The media_decode rationale
  * applied to text: a query that needs the candidate count AND the
  * secrets would otherwise run the scan twice.
  *
  * Arithmetic contract: BIT-IDENTICAL to the HOF path (spec-pinned
  * differential), hence to the DuckDB oracle —
  *  - tokens: `split(text, ' ')` semantics (regex split, trailing
  *    empties kept — irrelevant under the length floor);
  *  - candidate: length ≥ minLen AND `^[A-Za-z0-9_-]+$` AND has
  *    digit/lower/upper (char loops — equivalent to the anchored
  *    regexes on this alphabet);
  *  - entropy term per distinct char: round(−p·log2(p)·1e6) with
  *    log2 = Math.log(x)/Math.log(2) (Spark's Log2) and round =
  *    BigDecimal.valueOf → HALF_UP (Spark's Round on DOUBLE), summed
  *    as longs (order-free);
  *  - secrets: first-occurrence-distinct candidates whose entropy sum
  *    ≥ minMicroBits (Spark's array_distinct order).
  */
case class SecretScan(child: Expression, minLen: Int, minMicroBits: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"secret_scan expects STRING, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cands", ArrayType(StringType, containsNull = false)),
    StructField("secrets", ArrayType(StringType, containsNull = false))))

  private def isMachine(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '-'

  private def entropyMicroBits(t: String): Long = {
    // candidates are pure ASCII (alphabet-gated), so char == code point
    val counts = new Array[Int](128)
    var i = 0
    while (i < t.length) { counts(t.charAt(i).toInt) += 1; i += 1 }
    val n = t.length.toDouble
    var sum = 0L
    var c = 0
    while (c < 128) {
      if (counts(c) > 0) {
        val p = counts(c) / n
        val term = -p * (java.lang.Math.log(p) / java.lang.Math.log(2.0)) * 1e6
        sum += java.math.BigDecimal.valueOf(term)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
      c += 1
    }
    sum
  }

  def kernel(s: UTF8String): InternalRow = {
    val toks = s.toString.split(" ", -1)
    val cands = new scala.collection.mutable.ArrayBuffer[String](4)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.length >= minLen) {
        var machine = true; var dig = false; var low = false; var up = false
        var j = 0
        while (j < t.length && machine) {
          val ch = t.charAt(j)
          if (!isMachine(ch)) machine = false
          else if (ch >= '0' && ch <= '9') dig = true
          else if (ch >= 'a' && ch <= 'z') low = true
          else if (ch >= 'A' && ch <= 'Z') up = true
          j += 1
        }
        if (machine && dig && low && up) cands += t
      }
      i += 1
    }
    val secrets = new java.util.LinkedHashSet[String]()
    cands.foreach { t =>
      if (entropyMicroBits(t) >= minMicroBits) secrets.add(t): Unit
    }
    import scala.jdk.CollectionConverters._
    new GenericInternalRow(Array[Any](
      new GenericArrayData(cands.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(
        secrets.iterator().asScala.map(UTF8String.fromString).toArray[Any])))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference-object call: the scan is string-processing work, not
    // inlineable arithmetic — the call rides inside whole-stage codegen
    // with no UDF boundary (the MediaFeatures pattern)
    val self = ctx.addReferenceObj("secretScan", this,
      classOf[SecretScan].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SecretScan =
    copy(child = newChild)

  override def prettyName: String = "secret_scan"
}

object SecretScan {

  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"secret_scan expects 1 argument, got ${exprs.length}")
    SecretScan(exprs.head, 24, 3000000L)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "secret_scan", builder, "built-in")

  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("secret_scan", text)
  }
}
