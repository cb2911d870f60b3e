package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ScalaUDF, StructsToJson, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The host engine's JSON *construction* vocabulary — `json_object`,
  * `json_array`, `json` — used verbatim by the reference's GeoJSON-export
  * examples (examples/monaco_pure_sql.sql:101-113,
  * examples/monaco_end_to_end.sql:93-103). Spark's `to_json` serializes one
  * struct/array value; the host builds JSON from alternating key/value
  * arguments, and — crucially — a value that is itself JSON (a nested
  * `json_object`, a `::JSON` cast, `ST_AsGeoJSON` output) embeds RAW, not
  * re-escaped as a string.
  *
  * Spark has no JSON type to carry that distinction, so JSON-ness is
  * tracked STRUCTURALLY: a value child that is itself a JSON-producing
  * expression ([[JsonRaw]] from the `json(...)` function, a nested
  * [[JsonObjectExpr]]/[[JsonArrayExpr]], Spark's `to_json`, or the
  * `st_asgeojson` shim) embeds verbatim; every other value renders by its
  * Catalyst type with the host's minified formatting (no spaces, minimal
  * escaping, shortest-round-trip doubles — byte-compatible with the host's
  * yyjson output for the types the oracle exercises). The `::JSON` cast of
  * the host dialect is stripped at parse time by plans.Qualify (Spark has
  * no JSON type), which leaves the JSON-producing expression itself in
  * value position — exactly what the structural detection keys on.
  *
  * Both expressions are native codegen'd (children evaluate inside
  * whole-stage codegen; one static render call per row — same shape as the
  * repo's other host-vocabulary expressions). Nested values of array/struct
  * type are rejected at analysis with a pointer to `to_json`, mirroring the
  * host's requirement that compound values be JSON already.
  */
object JsonCompat {

  /** Structural JSON-ness: is `e` an expression whose string output is
    * already JSON text? (Aliases/casts do not appear inside expression
    * trees at this point; `::JSON` was stripped at parse time.)
    */
  private[functions] def isJsonProducing(e: Expression): Boolean = e match {
    case _: JsonRaw | _: JsonObjectExpr | _: JsonArrayExpr => true
    case _: StructsToJson                                  => true
    case u: ScalaUDF =>
      u.udfName.exists(n => JsonProducingUdfs.contains(n.toLowerCase))
    case _ => false
  }

  /** UDF-registered shims whose output is JSON text. */
  private val JsonProducingUdfs = Set("st_asgeojson")

  /** Type tags for the static render kernel (kept as ints so the codegen
    * reference object is a plain primitive array).
    */
  private[functions] final val TagString = 0
  private[functions] final val TagLong = 1
  private[functions] final val TagDouble = 2
  private[functions] final val TagDecimal = 3
  private[functions] final val TagBool = 4
  private[functions] final val TagDate = 5
  private[functions] final val TagTimestamp = 6
  private[functions] final val TagRaw = 7

  private[functions] def tagOf(e: Expression): Int =
    if (isJsonProducing(e)) TagRaw
    else e.dataType match {
      case StringType => TagString
      case ByteType | ShortType | IntegerType | LongType => TagLong
      case FloatType | DoubleType => TagDouble
      case _: DecimalType => TagDecimal
      case BooleanType => TagBool
      case DateType => TagDate
      case TimestampType | TimestampNTZType => TagTimestamp
      // a bare NULL literal — always renders as JSON null (tag irrelevant)
      case NullType => TagLong
      case dt => throw new IllegalArgumentException(
        s"json value of type $dt is not supported — wrap compound values " +
          "with to_json(...) or a nested json_object/json_array")
    }

  private def checkValueType(name: String, e: Expression): TypeCheckResult =
    try { tagOf(e); TypeCheckResult.TypeCheckSuccess }
    catch {
      case ex: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(s"$name: ${ex.getMessage}")
    }

  // ---- render kernel (shared by interpreted eval and generated code) ----

  /** Minimal JSON string escape, matching the host's yyjson defaults:
    * `"` and `\` escaped, control chars as \b \f \n \r \t or \u00XX,
    * everything else (including non-ASCII) raw UTF-8.
    */
  def appendEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20) sb.append(f"\\u${c.toInt}%04x") else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** yyjson-compatible double rendering (probed byte-for-byte against the
    * host engine's `json_object` output across the magnitude sweep,
    * JsonCompatSpec): shortest-round-trip digits, ECMAScript notation
    * thresholds — fixed notation for 1e-6 <= |x| < 1e21, exponential
    * otherwise with no '+' sign — and a ".0" suffix on integral fixed
    * values. Java 17's `Double.toString` differs in both digit generation
    * and notation ("1.0E7" vs "10000000.0"), which is why oracles with
    * doubles >= 1e7 used to diverge.
    */
  def formatDouble(v: Double): String = {
    if (v != v) "NaN"
    else if (v == Double.PositiveInfinity) "Infinity"
    else if (v == Double.NegativeInfinity) "-Infinity"
    else if (v == 0.0) { if (1.0 / v < 0) "-0.0" else "0.0" }
    else {
      val a = math.abs(v)
      val (d, e) = shortestDigits(a, 17, s => java.lang.Double.parseDouble(s) == a)
      renderFp(v < 0, d, e)
    }
  }

  /** Float variant: shortest digits that round-trip through FLOAT. */
  def formatFloat(v: Float): String = {
    if (v != v) "NaN"
    else if (v == Float.PositiveInfinity) "Infinity"
    else if (v == Float.NegativeInfinity) "-Infinity"
    else if (v == 0.0f) { if (1.0f / v < 0) "-0.0" else "0.0" }
    else {
      val a = math.abs(v).toDouble
      val (d, e) = shortestDigits(a, 9, s => java.lang.Float.parseFloat(s) == math.abs(v))
      renderFp(v < 0, d, e)
    }
  }

  /** Fewest significant digits whose decimal reading is exactly the value;
    * returns (digit string, decimal exponent of the leading digit).
    */
  private def shortestDigits(a: Double, maxP: Int, ok: String => Boolean): (String, Int) = {
    var p = 1
    var cand: String = null
    while (cand == null) {
      val c = String.format(java.util.Locale.ROOT, "%." + (p - 1) + "e",
        java.lang.Double.valueOf(a))
      if (p == maxP || ok(c)) cand = c else p += 1
    }
    val ei = cand.indexOf('e')
    (cand.substring(0, ei).replace(".", ""), cand.substring(ei + 1).toInt)
  }

  private def renderFp(neg: Boolean, digits: String, e: Int): String = {
    val sb = new java.lang.StringBuilder(32)
    if (neg) sb.append('-')
    if (e >= -6 && e <= 20) {
      if (e >= 0) {
        val intLen = e + 1
        if (digits.length <= intLen) {
          sb.append(digits)
          var i = digits.length
          while (i < intLen) { sb.append('0'); i += 1 }
          sb.append(".0")
        } else {
          sb.append(digits, 0, intLen).append('.')
            .append(digits, intLen, digits.length)
        }
      } else {
        sb.append("0.")
        var i = -1
        while (i > e) { sb.append('0'); i -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(e)
    }
    sb.toString
  }

  private def appendValue(sb: java.lang.StringBuilder, v: Any, tag: Int): Unit = {
    if (v == null) { sb.append("null"); return }
    (tag: @annotation.switch) match {
      case TagString  => appendEscaped(sb, v.toString)
      case TagLong    => sb.append(v.toString)
      case TagDouble  => v match {
        case f: java.lang.Float => sb.append(formatFloat(f.floatValue))
        case d                  => sb.append(formatDouble(d.asInstanceOf[java.lang.Double].doubleValue))
      }
      case TagDecimal => sb.append(
        v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toPlainString)
      case TagBool    => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case TagDate    => appendEscaped(sb,
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
      case TagTimestamp =>
        val micros = v.asInstanceOf[Long]
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
          f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
        val frac = Math.floorMod(micros, 1000000L)
        appendEscaped(sb, if (frac == 0) base else f"$base%s.$frac%06d".reverse.dropWhile(_ == '0').reverse)
      case TagRaw     => sb.append(v.toString)
    }
  }

  /** Static kernel for `json_object` — `vals` alternates key/value. */
  def buildObject(vals: Array[AnyRef], tags: Array[Int]): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var i = 0
    while (i < vals.length) {
      if (i > 0) sb.append(',')
      val k = vals(i)
      appendEscaped(sb, if (k == null) "null" else k.toString)
      sb.append(':')
      appendValue(sb, vals(i + 1), tags(i + 1))
      i += 2
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  /** Static kernel for `json_array`. */
  def buildArray(vals: Array[AnyRef], tags: Array[Int]): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('[')
    var i = 0
    while (i < vals.length) {
      if (i > 0) sb.append(',')
      appendValue(sb, vals(i), tags(i))
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  // ---- expressions ----

  /** `json(x)`: tags a string as JSON text (the host parses/validates and
    * returns JSON type; with no JSON type here this is the identity on the
    * text, serving as the raw-embedding marker for the builders above).
    */
  case class JsonRaw(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    // NOT foldable even over a literal: constant folding would replace the
    // marker with a plain string Literal before execution, and the builders'
    // structural raw-detection (computed at eval time) would then escape it
    override def foldable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(s"json expects STRING, got $dt")
    }
    override def nullSafeEval(s: Any): Any = s
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => c)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "json"
  }

  private def genBuild(ctx: CodegenContext, ev: ExprCode,
                       children: Seq[Expression], tags: Array[Int],
                       kernel: String): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val valsTerm = ctx.freshName("jsonVals")
    val tagsRef = ctx.addReferenceObj("jsonTags", tags, "int[]")
    val assigns = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val boxed =
        if (CodeGenerator.isPrimitiveType(c.dataType))
          s"(Object) ${CodeGenerator.boxedType(c.dataType)}.valueOf(${e.value})"
        else s"(Object) ${e.value}"
      code"""
        ${e.code}
        if (!${e.isNull}) $valsTerm[$i] = $boxed;
      """
    }
    val assignCode =
      if (assigns.isEmpty) org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock
      else assigns.reduce(_ + _)
    ev.copy(
      code = code"""
        Object[] $valsTerm = new Object[${children.length}];
        $assignCode
        UTF8String ${ev.value} =
          graft.functions.JsonCompat.$kernel($valsTerm, $tagsRef);
        boolean ${ev.isNull} = false;
      """)
  }

  /** `json_object(k1, v1, k2, v2, ...)` — host key/value JSON constructor. */
  case class JsonObjectExpr(children: Seq[Expression]) extends Expression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult = {
      if (children.length % 2 != 0)
        return TypeCheckResult.TypeCheckFailure(
          "json_object expects an even number of arguments (key, value, ...)")
      children.grouped(2).zipWithIndex.foldLeft(
        TypeCheckResult.TypeCheckSuccess: TypeCheckResult) {
        case (ok @ TypeCheckResult.TypeCheckSuccess, (Seq(k, v), i)) =>
          if (k.dataType != StringType)
            TypeCheckResult.TypeCheckFailure(
              s"json_object key ${i + 1} must be STRING, got ${k.dataType}")
          else checkValueType("json_object", v) match {
            case TypeCheckResult.TypeCheckSuccess => ok
            case fail => fail
          }
        case (fail, _) => fail
      }
    }
    private lazy val tags: Array[Int] = children.map(tagOf).toArray
    override def eval(input: InternalRow): Any = {
      val vals = new Array[AnyRef](children.length)
      var i = 0
      while (i < vals.length) {
        vals(i) = children(i).eval(input).asInstanceOf[AnyRef]
        i += 1
      }
      buildObject(vals, tags)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      genBuild(ctx, ev, children, tags, "buildObject")
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
    override def prettyName: String = "json_object"
  }

  /** `json_array(v1, v2, ...)` — host JSON array constructor. */
  case class JsonArrayExpr(children: Seq[Expression]) extends Expression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult =
      children.foldLeft(TypeCheckResult.TypeCheckSuccess: TypeCheckResult) {
        case (ok @ TypeCheckResult.TypeCheckSuccess, v) =>
          checkValueType("json_array", v) match {
            case TypeCheckResult.TypeCheckSuccess => ok
            case fail => fail
          }
        case (fail, _) => fail
      }
    private lazy val tags: Array[Int] = children.map(tagOf).toArray
    override def eval(input: InternalRow): Any = {
      val vals = new Array[AnyRef](children.length)
      var i = 0
      while (i < vals.length) {
        vals(i) = children(i).eval(input).asInstanceOf[AnyRef]
        i += 1
      }
      buildArray(vals, tags)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      genBuild(ctx, ev, children, tags, "buildArray")
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
    override def prettyName: String = "json_array"
  }

  // ---- registration ----

  /** Pin JSON-ness at BUILD time: a value child that is JSON-producing is
    * wrapped in the non-foldable [[JsonRaw]] marker, so the rawness
    * survives constant folding (a foldable `to_json(...)` would otherwise
    * collapse to a string Literal before the execution-time tag check and
    * silently re-escape). The lazy structural check in tagOf remains as the
    * safety net for children that resolve later.
    */
  private def pinRaw(e: Expression): Expression =
    if (isJsonProducing(e)) JsonRaw(e) else e

  val entries: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "json_object" -> (exprs => JsonObjectExpr(
      exprs.zipWithIndex.map { case (e, i) => if (i % 2 == 1) pinRaw(e) else e })),
    "json_array"  -> (exprs => JsonArrayExpr(exprs.map(pinRaw))),
    "json"        -> (exprs => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"json expects 1 argument, got ${exprs.length}")
      JsonRaw(exprs.head)
    }))

  /** Per-session path for sessions built without GraftExtensions. */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  /** injectFunction tuples for GraftExtensions. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    entries.map { case (name, builder) =>
      (new FunctionIdentifier(name),
        new ExpressionInfo(JsonCompat.getClass.getName, name), builder)
    }
}
