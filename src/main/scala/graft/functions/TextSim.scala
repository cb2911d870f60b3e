package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The host engine's text-similarity family — `jaccard`, `hamming` (alias
  * `mismatches`), `jaro_similarity`, `jaro_winkler_similarity`,
  * `damerau_levenshtein` — as native codegen'd expressions. These are
  * first-class near-dup/quality primitives (fuzzy key matching, OCR noise
  * scoring) and Spark ships only `levenshtein`.
  *
  * Semantics pinned empirically against the host (byte-level, matching its
  * raw-UTF-8 treatment: `jaccard('héllo','hello') = 0.5` — byte sets, not
  * codepoints):
  *  - jaccard: similarity of DISTINCT BYTE sets; errors on an empty
  *    argument ("argument too short"), case-sensitive
  *  - hamming: differing positions of equal-LENGTH byte strings; errors on
  *    length mismatch
  *  - jaro: standard match-window/transposition formula
  *  - jaro_winkler: jaro + 0.1 · prefix(≤4) · (1 − jaro), boost applied
  *    only when jaro exceeds the classic 0.7 threshold (pinned: a
  *    common-prefix pair at jaro 0.47 gets NO boost)
  *  - damerau_levenshtein: FULL DL with an alphabet table (adjacent
  *    transposition distance 'ca'→'abc' = 2, where restricted OSA says 3)
  */
object TextSim {

  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length == 0 || y.length == 0)
      throw new IllegalArgumentException("Jaccard Function: An argument too short!")
    val sa = new Array[Boolean](256); val sb = new Array[Boolean](256)
    var i = 0
    while (i < x.length) { sa(x(i) & 0xFF) = true; i += 1 }
    i = 0
    while (i < y.length) { sb(y(i) & 0xFF) = true; i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 256) {
      if (sa(i) || sb(i)) union += 1
      if (sa(i) && sb(i)) inter += 1
      i += 1
    }
    inter.toDouble / union
  }

  def hamming(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    if (x.length != y.length)
      throw new IllegalArgumentException(
        "Mismatch Function: Strings must be of equal length!")
    var n = 0L; var i = 0
    while (i < x.length) { if (x(i) != y(i)) n += 1; i += 1 }
    n
  }

  def jaro(a: UTF8String, b: UTF8String): Double = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    if (la == 0 || lb == 0)
      throw new IllegalArgumentException("Jaro Function: An argument too short!")
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la); val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && x(i) == y(j)) { aM(i) = true; bM(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (x(i) != y(k)) t += 1
        k += 1
      }
      i += 1
    }
    // the host FLOORS the transposition halving (integer division — pinned
    // by fuzzing 4000 random pairs to zero divergence; t/2.0 diverges)
    val tr = t / 2
    (m.toDouble / la + m.toDouble / lb + (m.toDouble - tr) / m) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    val x = a.getBytes; val y = b.getBytes
    var p = 0
    while (p < 4 && p < x.length && p < y.length && x(p) == y(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }

  def damerauLevenshtein(a: UTF8String, b: UTF8String): Long = {
    val x = a.getBytes; val y = b.getBytes
    val la = x.length; val lb = y.length
    val inf = la + lb
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da(y(j - 1) & 0xFF)
        val j1 = db
        var cost = 1
        if (x(i - 1) == y(j - 1)) { cost = 0; db = j }
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1,
            d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)))
        j += 1
      }
      da(x(i - 1) & 0xFF) = i
      i += 1
    }
    d(la + 1)(lb + 1).toLong
  }

  sealed trait SimExpression extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (STRING, STRING), got (${left.dataType}, ${right.dataType})")
    protected def kernel: String
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) =>
        s"${ev.value} = graft.functions.TextSim.$kernel($l, $r);")
  }

  case class JaccardSim(left: Expression, right: Expression)
      extends SimExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaccard"
    override def nullSafeEval(l: Any, r: Any): Any =
      jaccard(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def kernel: String = "jaccard"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class HammingDist(left: Expression, right: Expression)
      extends SimExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hamming"
    override def nullSafeEval(l: Any, r: Any): Any =
      hamming(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def kernel: String = "hamming"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class JaroSim(left: Expression, right: Expression)
      extends SimExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_similarity"
    override def nullSafeEval(l: Any, r: Any): Any =
      jaro(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def kernel: String = "jaro"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends SimExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler_similarity"
    override def nullSafeEval(l: Any, r: Any): Any =
      jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def kernel: String = "jaroWinkler"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class DamerauLev(left: Expression, right: Expression)
      extends SimExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "damerau_levenshtein"
    override def nullSafeEval(l: Any, r: Any): Any =
      damerauLevenshtein(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    override protected def kernel: String = "damerauLevenshtein"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }
}
