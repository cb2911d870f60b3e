package graft.functions

/** Allocation-free MD5 (RFC 1321) specialized for the MinHash hot loop:
  * millions-to-billions of digests over SHORT inputs ("<seed>|" + q-gram
  * shingle, a dozen bytes). `java.security.MessageDigest` pays a virtual
  * reset/update/digest call chain plus a fresh 16-byte output array per
  * digest — measured ~3× slower than this inlined single-block compress on
  * the p126 scale-witness signature stage (guide §1.2 step 2: per-task
  * work, after the shape is right).
  *
  * Output contract: [[Md5Ctx.hash60]] returns the 60-bit value the whole
  * dedup family keys on — the first 8 digest bytes read big-endian,
  * unsigned-shifted right 4, i.e. `conv(substring(md5(x),1,15),16,10)`.
  * Bit-identity with MessageDigest is pinned in Md5Spec across lengths
  * (empty, single-block, pad-boundary 55/56/64, multi-block) and multibyte
  * UTF-8 — every oracle hash downstream depends on it.
  *
  * One instance per thread (the buffers are the state); not thread-safe.
  */
final class Md5Ctx {
  private val block = new Array[Byte](64)
  private val m = new Array[Int](16)
  private var h0 = 0
  private var h1 = 0
  private var h2 = 0
  private var h3 = 0

  /** 60-bit md5 prefix of (prefix ++ data[0, dataLen)). */
  def hash60(prefix: Array[Byte], data: Array[Byte], dataLen: Int): Long = {
    h0 = 0x67452301
    h1 = 0xefcdab89
    h2 = 0x98badcfe
    h3 = 0x10325476
    val total = prefix.length + dataLen
    var produced = 0 // message bytes already compressed
    // stream whole 64-byte blocks of the logical message prefix++data
    while (total - produced >= 64) {
      fillBlock(prefix, data, dataLen, produced, 64)
      decode(16)
      compress()
      produced += 64
    }
    // final block(s): remainder + 0x80 + zero pad + 64-bit LE bit length
    val rem = total - produced
    fillBlock(prefix, data, dataLen, produced, rem)
    block(rem) = 0x80.toByte
    java.util.Arrays.fill(block, rem + 1, 64, 0.toByte)
    if (rem >= 56) { // length does not fit: one extra block
      decode(16)
      compress()
      java.util.Arrays.fill(block, 0, 64, 0.toByte)
    }
    decode(14)
    val bitLen = total.toLong << 3
    m(14) = bitLen.toInt
    m(15) = (bitLen >>> 32).toInt
    compress()
    // digest bytes 0..7 are h0 then h1, little-endian each; read
    // big-endian as one 64-bit value, then >>> 4 for the 60-bit prefix
    val d0 = java.lang.Integer.reverseBytes(h0)
    val d1 = java.lang.Integer.reverseBytes(h1)
    (((d0.toLong & 0xffffffffL) << 32) | (d1.toLong & 0xffffffffL)) >>> 4
  }

  /** Copy `len` bytes of the logical message (prefix ++ data) starting at
    * message offset `off` into `block`.
    */
  private def fillBlock(prefix: Array[Byte], data: Array[Byte], dataLen: Int,
                        off: Int, len: Int): Unit = {
    var bi = 0
    var mi = off
    val pl = prefix.length
    while (bi < len && mi < pl) { block(bi) = prefix(mi); bi += 1; mi += 1 }
    if (bi < len) System.arraycopy(data, mi - pl, block, bi, len - bi)
  }

  /** Little-endian decode of block bytes into m(0 until words). */
  private def decode(words: Int): Unit = {
    var i = 0
    while (i < words) {
      val j = i << 2
      m(i) = (block(j) & 0xff) | ((block(j + 1) & 0xff) << 8) |
        ((block(j + 2) & 0xff) << 16) | ((block(j + 3) & 0xff) << 24)
      i += 1
    }
  }

  /** One MD5 compression of `m` into the running state (feed-forward
    * included).
    */
  private def compress(): Unit = {
    var a = h0; var b = h1; var c = h2; var d = h3
    val K = Md5Ctx.K
    val S = Md5Ctx.S
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + java.lang.Integer.rotateLeft(
        a + f + K(i) + m(g), S(((i >> 4) << 2) | (i & 3)))
      a = tmp
      i += 1
    }
    h0 += a; h1 += b; h2 += c; h3 += d
  }
}

object Md5Ctx {
  /** Per-round left-rotate amounts, indexed round*4 + (i mod 4). */
  private[functions] val S = Array(
    7, 12, 17, 22, 5, 9, 14, 20, 4, 11, 16, 23, 6, 10, 15, 21)

  /** The canonical sine-derived constant table (RFC 1321 §3.4). */
  private[functions] val K = Array(
    0xd76aa478, 0xe8c7b756, 0x242070db, 0xc1bdceee,
    0xf57c0faf, 0x4787c62a, 0xa8304613, 0xfd469501,
    0x698098d8, 0x8b44f7af, 0xffff5bb1, 0x895cd7be,
    0x6b901122, 0xfd987193, 0xa679438e, 0x49b40821,
    0xf61e2562, 0xc040b340, 0x265e5a51, 0xe9b6c7aa,
    0xd62f105d, 0x02441453, 0xd8a1e681, 0xe7d3fbc8,
    0x21e1cde6, 0xc33707d6, 0xf4d50d87, 0x455a14ed,
    0xa9e3e905, 0xfcefa3f8, 0x676f02d9, 0x8d2a4c8a,
    0xfffa3942, 0x8771f681, 0x6d9d6122, 0xfde5380c,
    0xa4beea44, 0x4bdecfa9, 0xf6bb4b60, 0xbebfbc70,
    0x289b7ec6, 0xeaa127fa, 0xd4ef3085, 0x04881d05,
    0xd9d4d039, 0xe6db99e5, 0x1fa27cf8, 0xc4ac5665,
    0xf4292244, 0x432aff97, 0xab9423a7, 0xfc93a039,
    0x655b59c3, 0x8f0ccc92, 0xffeff47d, 0x85845dd1,
    0x6fa87e4f, 0xfe2ce6e0, 0xa3014314, 0x4e0811a1,
    0xf7537e82, 0xbd3af235, 0x2ad7d2bb, 0xeb86d391)
}
