package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bit-identity gate for the allocation-free MD5 kernel (Md5Ctx): every
  * dedup-family oracle hash keys on `conv(substring(md5(x),1,15),16,10)`,
  * so the kernel must agree with java.security.MessageDigest on EVERY
  * input — including the padding boundaries (55/56/63/64 bytes), the empty
  * message, multi-block messages, and multibyte UTF-8.
  */
class Md5Spec extends AnyFunSuite {

  private def reference60(prefix: Array[Byte], data: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(prefix)
    md.update(data)
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  test("hash60 == MessageDigest on every length 0..130 (pad boundaries included)") {
    val ctx = new graft.functions.Md5Ctx
    val rnd = new scala.util.Random(7)
    for (n <- 0 to 130) {
      val data = Array.fill(n)(rnd.nextInt(256).toByte)
      for (prefix <- Seq("", "0|", "11|", "7|")) {
        val p = prefix.getBytes("US-ASCII")
        assert(ctx.hash60(p, data, n) == reference60(p, data),
          s"mismatch at prefix='$prefix' len=$n")
      }
    }
  }

  test("hash60 == MessageDigest on the shingle form for all seeds") {
    val ctx = new graft.functions.Md5Ctx
    val shingles = Seq("abcde", "ab", "", "héllo", "日本語のテキスト",
      "x" * 55, "y" * 56, "z" * 64, "w" * 200)
    for (sh <- shingles; seed <- 0 until 16) {
      val p = s"$seed|".getBytes("US-ASCII")
      val d = sh.getBytes("UTF-8")
      assert(ctx.hash60(p, d, d.length) == reference60(p, d),
        s"mismatch at seed=$seed shingle='${sh.take(8)}...' (${d.length} bytes)")
    }
  }

  test("hash60 honors dataLen (trailing buffer bytes ignored)") {
    val ctx = new graft.functions.Md5Ctx
    val buf = "hello world padding garbage".getBytes("UTF-8")
    val p = "3|".getBytes("US-ASCII")
    assert(ctx.hash60(p, buf, 5) == reference60(p, "hello".getBytes("UTF-8")))
  }

  test("minhash_sig via Md5Ctx matches the SQL expression arithmetic") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "the quick brown fox"), (2L, "pack my box"), (3L, "ab"),
      (4L, ""), (5L, "naïve café 日本")).toDF("doc_id", "text")
    val kernel = df.select($"doc_id",
        graft.functions.MinhashSig(spark, $"text", 5, 12).as("sig"))
      .orderBy($"doc_id").collect().map(_.getSeq[Long](1))
    val sql = (0 until 12).map(seed =>
      array_min(transform(
        array_distinct(graft.ops.Dedup.shinglesExpr("text", 5)),
        s => conv(substring(md5(concat(lit(s"$seed|"), s)), 1, 15), 16, 10)
          .cast("long"))))
    val expected = df.select($"doc_id", array(sql: _*).as("sig"))
      .orderBy($"doc_id").collect().map(_.getSeq[Long](1))
    assert(kernel.toSeq == expected.toSeq)
  }
}
