package graft.algo

/** Primitive collections for the routing hot paths (guide §1.2 step 2 —
  * per-task work). The boxed `java.util.PriorityQueue[Array[Long]]` Dijkstra
  * heap allocated a 2-long array PER EDGE RELAXATION — at the r24 Italy
  * witness (2000 tile Dijkstras × ~1.2M relaxations) that is tens of GB of
  * transient garbage; the profiler measured 469 s of GC inside 1005 s of
  * task time on the tile-legs stage. These replace the heap and the boxed
  * `HashMap[Long, Integer]` id index with allocation-free primitive arrays.
  */

/** Binary min-heap over (priority: Long, value: Int) pairs in parallel
  * primitive arrays. Not thread-safe; one instance per search.
  */
final class LongMinHeap(initialCapacity: Int = 64) extends Serializable {
  private var ds = new Array[Long](math.max(4, initialCapacity))
  private var vs = new Array[Int](ds.length)
  private var n = 0

  def size: Int = n
  def isEmpty: Boolean = n == 0
  def nonEmpty: Boolean = n > 0
  def clear(): Unit = n = 0

  /** Priority of the minimum element (undefined when empty). */
  def topDist: Long = ds(0)

  /** Value of the minimum element (undefined when empty). */
  def topNode: Int = vs(0)

  def add(d: Long, v: Int): Unit = {
    if (n == ds.length) {
      ds = java.util.Arrays.copyOf(ds, n << 1)
      vs = java.util.Arrays.copyOf(vs, n << 1)
    }
    var i = n
    n += 1
    while (i > 0) {
      val p = (i - 1) >> 1
      if (ds(p) <= d) {
        ds(i) = d; vs(i) = v
        return
      }
      ds(i) = ds(p); vs(i) = vs(p)
      i = p
    }
    ds(0) = d; vs(0) = v
  }

  /** Remove the minimum element (undefined when empty). */
  def removeTop(): Unit = {
    n -= 1
    if (n == 0) return
    val d = ds(n); val v = vs(n)
    var i = 0
    var c = 1
    while (c < n) {
      if (c + 1 < n && ds(c + 1) < ds(c)) c += 1
      if (ds(c) >= d) {
        ds(i) = d; vs(i) = v
        return
      }
      ds(i) = ds(c); vs(i) = vs(c)
      i = c
      c = (i << 1) + 1
    }
    ds(i) = d; vs(i) = v
  }
}

/** Open-addressing Long → Int hash map with linear probing; `get` returns
  * -1 for absent keys (values must be >= 0 — they are dense local indices).
  */
final class LongIntHashMap(expected: Int) extends Serializable {
  private var cap = java.lang.Integer.highestOneBit(
    math.max(8, expected * 2 - 1)) << 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  private def slot(k: Long): Int = {
    // 64→32 bit mix (splitmix64 finalizer tail), then mask
    var h = k
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    (h & (cap - 1)).toInt
  }

  def put(k: Long, v: Int): Unit = {
    if ((n + 1) * 4 > cap * 3) grow()
    var i = slot(k)
    while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
    if (!used(i)) { used(i) = true; keys(i) = k; n += 1 }
    vals(i) = v
  }

  /** The mapped value, or -1 when absent. */
  def get(k: Long): Int = {
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & (cap - 1)
    }
    -1
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val oc = cap
    cap <<= 1
    keys = new Array[Long](cap)
    vals = new Array[Int](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < oc) {
      if (ou(i)) put(ok(i), ov(i))
      i += 1
    }
  }
}

/** Append-only growable primitive long buffer. */
final class LongBuf(initialCapacity: Int = 1024) extends Serializable {
  private var a = new Array[Long](math.max(4, initialCapacity))
  private var n = 0
  def size: Int = n
  def apply(i: Int): Long = a(i)
  def add(v: Long): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
    a(n) = v
    n += 1
  }
  /** The backing array — valid in [0, size). */
  def raw: Array[Long] = a
}
