package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for ftfy-class mojibake repair:
  * `mojibake_fix(text)` → STRUCT<fixed: STRING, rounds: INT>.
  *
  * The dominant real-corpus corruption is DOUBLE ENCODING: UTF-8 bytes
  * misread as windows-1252 (or latin-1) and re-encoded as UTF-8 — "é"
  * arrives as "Ã©", "€" as "â‚¬", sometimes twice over ("ÃÂ©").
  * The repair inverts that pipe deterministically:
  *
  *  1. map each char back to ONE byte through "sloppy windows-1252" —
  *     ASCII and U+00A0–U+00FF are themselves, the 27 C1-display chars
  *     (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • – — ˜ ™ š › œ ž Ÿ) map to
  *     0x80–0x9F, and the five bytes windows-1252 leaves undefined
  *     (0x81 0x8D 0x8F 0x90 0x9D) come back from their C1 CONTROL
  *     chars — the latin-1 leg real decoders fall through to (ftfy's
  *     sloppy-windows-1252). Any other char (CJK, emoji, '✓') means
  *     the text is NOT this mojibake — stop;
  *  2. STRICT UTF-8 decode of those bytes. Failure means the original
  *     high bytes were genuine legacy text ("café" as latin-1), not
  *     re-encoded UTF-8 — stop, NEVER alter it;
  *  3. accept and iterate (cap 4 rounds — double mojibake is common,
  *     deeper nests exist in the wild but a cap keeps the kernel
  *     total).
  *
  * Pure-ASCII text short-circuits at zero cost. The contract is
  * conservative by construction: a repair only happens when the char
  * sequence is byte-for-byte a valid UTF-8 stream seen through the
  * 1252 glass — the probability of that for honest non-mojibake text
  * is negligible (every multi-byte char needs a lead in Ã€–ÿ followed
  * by exact continuation chars).
  *
  * Codegen: reference-object call (the SecretScan/MediaFeatures
  * pattern) — rides inside whole-stage codegen with no UDF boundary,
  * and a query consuming both `fixed` and `rounds` pays ONE repair.
  */
case class MojibakeFix(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mojibake_fix expects STRING, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("fixed", StringType, nullable = false),
    StructField("rounds", IntegerType, nullable = false)))

  def kernel(s: UTF8String): InternalRow = {
    var cur = s.toString
    var rounds = 0
    var continue = true
    while (continue && rounds < 4) {
      val repaired = MojibakeFix.repairOnce(cur)
      if (repaired == null) continue = false
      else { cur = repaired; rounds += 1 }
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(cur), rounds))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mojibakeFix", this,
      classOf[MojibakeFix].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MojibakeFix =
    copy(child = newChild)

  override def prettyName: String = "mojibake_fix"
}

object MojibakeFix {

  /** windows-1252 bytes 0x80–0x9F as display chars; 0 marks the five
    * undefined bytes (which round-trip via their C1 control chars).
    */
  private val C1: Array[Char] = Array(
    '€', 0, '‚', 'ƒ', '„', '…', '†', '‡',
    'ˆ', '‰', 'Š', '‹', 'Œ', 0, 'Ž', 0,
    0, '‘', '’', '“', '”', '•', '–', '—',
    '˜', '™', 'š', '›', 'œ', 0, 'ž', 'Ÿ')

  /** C1-display char → its 0x80–0x9F byte (the 27 defined entries). */
  private val inv: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    var i = 0
    while (i < 32) {
      if (C1(i) != 0) m.put(C1(i), 0x80 + i)
      i += 1
    }
    m
  }

  /** One inversion round, or null when the text is not this mojibake.
    * Chars ≤ U+00FF map to their own byte (the latin-1 leg — includes
    * C1 CONTROL chars, which lenient latin-1 decoders emit for
    * 0x80–0x9F); the C1-display chars map through [[inv]]; anything
    * else is unmappable.
    */
  private[functions] def repairOnce(s: String): String = {
    val n = s.length
    // pure ASCII is never mojibake; also collect the byte form
    var hasHigh = false
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x80) bytes(i) = c.toByte
      else {
        hasHigh = true
        if (c <= 0xff) bytes(i) = c.toByte
        else {
          val b = inv.get(c)
          if (b == null) return null
          bytes(i) = b.byteValue()
        }
      }
      i += 1
    }
    if (!hasHigh) return null
    decodeUtf8Strict(bytes)
  }

  /** Strict UTF-8 decode (RFC 3629: no overlongs, no surrogates, max
    * U+10FFFF); null on any violation.
    */
  private[functions] def decodeUtf8Strict(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Fixture-side: what a sloppy-1252 misdecode DOES to honest UTF-8 —
    * the forward corruption the kernel inverts. Bytes undefined in
    * windows-1252 surface as their C1 control chars (the behavior of
    * real lenient decoders).
    */
  def corruptOnce(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new StringBuilder(bytes.length)
    for (b <- bytes) {
      val v = b & 0xff
      if (v < 0x80 || v >= 0xa0) out.append(v.toChar)
      else C1(v - 0x80) match {
        case 0 => out.append(v.toChar)
        case c => out.append(c)
      }
    }
    out.toString
  }

  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"mojibake_fix expects 1 argument, got ${exprs.length}")
    MojibakeFix(exprs.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mojibake_fix", builder, "built-in")

  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("mojibake_fix", text)
  }
}
