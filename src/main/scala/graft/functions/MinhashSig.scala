package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full k-function MinHash signature of a
  * string in ONE per-row kernel — `minhash_sig(text, q, k)` returns
  * `ARRAY<BIGINT>` of the k minima over distinct q-gram shingles.
  *
  * Since r13 this kernel is the signature path for BOTH the batch pipeline
  * (Dedup.minhashSignatures — shuffle-free, one pass) and stateless
  * streaming stages. The HOF formulation (k× `array_min` over
  * `transform`/`md5` lambdas) evaluates interpreted and re-computes the
  * shingle array per hash function — measured 124 s for a 500-doc
  * micro-batch. This kernel runs the identical arithmetic as one tight
  * loop: distinct shingles once, k digests per shingle, ~1 s for the same
  * batch, and it stays inside whole-stage codegen. The explode + k
  * min-aggregate form survives as Dedup.minhashSignaturesAgg for corpora
  * whose single documents are too large for a per-row shingle set.
  *
  * Hash contract (bit-identical to the batch path and the DuckDB oracle):
  * value = 60-bit numeric prefix of md5("<seed>|" + shingle), i.e.
  * `conv(substring(md5(concat(seed || '|', s)), 1, 15), 16, 10)` — the
  * first 15 hex chars read big-endian, computed here as the first 8 digest
  * bytes unsigned-shifted right 4. Shingles are `substring(text, i, q)`
  * for i in 1..max(len-q+1, 1) (one whole-text shingle when len < q,
  * matching Dedup.shinglesExpr's `greatest`).
  */
case class MinhashSig(child: Expression, q: Int, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects STRING, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    MinhashSig.compute(s.asInstanceOf[UTF8String], q, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSig.compute($c, $q, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {

  private val threadMd5 = ThreadLocal.withInitial[Md5Ctx](() => new Md5Ctx)

  /** "0|".."<k-1>|" prefix bytes, cached per k (k is a plan-time constant). */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      kk => Array.tabulate(kk)(s => s"$s|".getBytes("US-ASCII")))

  def compute(text: UTF8String, q: Int, k: Int): ArrayData = {
    val md = threadMd5.get()
    val pre = prefixes(k)
    val nsh = math.max(text.numChars() - q + 1, 1)
    val seen = new java.util.HashSet[UTF8String]()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 1
    while (i <= nsh) {
      val sh = text.substringSQL(i, q)
      if (seen.add(sh)) {
        val sb = sh.getBytes
        var s = 0
        while (s < k) {
          // allocation-free 60-bit md5 prefix (see Md5Ctx — bit-identical
          // to MessageDigest, pinned in Md5Spec)
          val v = md.hash60(pre(s), sb, sb.length)
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  /** Register `minhash_sig(text, q, k)` as a session SQL function (q and k
    * must fold to INT literals).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"minhash_sig expects 3 arguments, got ${exprs.length}")
        require(exprs(1).foldable && exprs(2).foldable,
          "minhash_sig: q and k must be literals")
        MinhashSig(exprs(0),
          exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])
      }, "built-in")

  /** Column-level entry point (same route as [[CosineSim.apply]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column, q: Int, k: Int):
      org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_sig", text,
      org.apache.spark.sql.functions.lit(q), org.apache.spark.sql.functions.lit(k))
  }
}
