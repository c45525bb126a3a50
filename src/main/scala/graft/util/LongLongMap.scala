package graft.util

/** Minimal primitive open-addressing long→long hash map (linear
  * probing, power-of-two capacity, grow at 60% load). Exists for the
  * driver-side union-find arm of
  * [[graft.operators.Dedup.connectedComponents]]: a boxed
  * `java.util.HashMap[Long, Long]` costs ~90 B per entry (two boxed
  * longs + node + table slot) where this map costs 16 B — at the
  * 50M-edge local limit that is the difference between hundreds of MB
  * and many GB of driver heap.
  *
  * Key restriction: `EMPTY` (Long.MinValue) is reserved as the
  * empty-slot marker and cannot be used as a key — fine for doc ids,
  * which are non-negative everywhere in this library.
  */
final class LongLongMap(initialCapacity: Int = 1 << 16) {
  private val EMPTY = Long.MinValue

  private var cap = {
    var c = 16
    while (c < initialCapacity) c <<= 1
    c
  }
  private var mask = cap - 1
  private var keys = Array.fill[Long](cap)(EMPTY)
  private var vals = new Array[Long](cap)
  private var n = 0

  private def idx(k: Long): Int = {
    // Stafford mix13 finalizer: full-avalanche spread of sequential ids
    var h = k
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt & mask
  }

  def size: Int = n

  def getOrDefault(k: Long, default: Long): Long = {
    var i = idx(k)
    while (keys(i) != EMPTY) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    default
  }

  /** get of a key known to be present (union-find path compression). */
  def get(k: Long): Long = getOrDefault(k, k)

  def put(k: Long, v: Long): Unit = {
    require(k != EMPTY, "Long.MinValue is the reserved empty marker")
    var i = idx(k)
    while (keys(i) != EMPTY) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
    keys(i) = k
    vals(i) = v
    n += 1
    if (n * 5 > cap * 3) grow() // load factor 0.6
  }

  /** Iterate over the key set. Safe to `put` EXISTING keys from `f`
    * (value updates don't move slots); inserting NEW keys during
    * iteration is not (a grow would rehash mid-scan). Union-find path
    * compression only rewrites present keys, so calling `find` from
    * `f` is fine. */
  def foreachKey(f: Long => Unit): Unit = {
    var j = 0
    while (j < keys.length) {
      if (keys(j) != EMPTY) f(keys(j))
      j += 1
    }
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap <<= 1; mask = cap - 1
    keys = Array.fill[Long](cap)(EMPTY)
    vals = new Array[Long](cap)
    var j = 0
    while (j < ok.length) {
      if (ok(j) != EMPTY) {
        var i = idx(ok(j))
        while (keys(i) != EMPTY) i = (i + 1) & mask
        keys(i) = ok(j)
        vals(i) = ov(j)
      }
      j += 1
    }
  }
}
