package graft.graph

/** Minimal open-addressing long -> double hash map (linear probing,
  * power-of-2 capacity, no boxing) for the per-partition hot loops of the
  * CSR supersteps. A boxed java.util.HashMap[Long, Double] here measured
  * ~4x slower per iteration from allocation/GC churn alone.
  *
  * Not thread-safe; one instance per task partition.
  */
final class LongDoubleMap(initialCapacity: Int = 1 << 10) {
  private[this] final val EMPTY = 0L
  private[this] var cap = Integer.highestOneBit(math.max(16, initialCapacity) * 2 - 1) << 1
  private[this] var mask = cap - 1
  private[this] var keys = new Array[Long](cap)
  private[this] var vals = new Array[Double](cap)
  private[this] var used = 0
  // key 0 needs a dedicated slot (0 is the array-default "empty" marker)
  private[this] var hasZero = false
  private[this] var zeroVal = 0.0

  private def idx(k: Long): Int = {
    // finalizer from splitmix64 — good avalanche for sequential ids
    var h = k * -7046029254386353131L
    h ^= h >>> 32
    (h & mask).toInt
  }

  def addValue(k: Long, inc: Double): Unit = {
    if (k == EMPTY) { if (!hasZero) { hasZero = true; zeroVal = inc } else zeroVal += inc; return }
    var i = idx(k)
    while (true) {
      val cur = keys(i)
      if (cur == k) { vals(i) += inc; return }
      if (cur == EMPTY) {
        keys(i) = k; vals(i) = inc; used += 1
        if (used * 2 > cap) grow()
        return
      }
      i = (i + 1) & mask
    }
  }

  def getOrElse(k: Long, default: Double): Double = {
    if (k == EMPTY) return if (hasZero) zeroVal else default
    var i = idx(k)
    while (true) {
      val cur = keys(i)
      if (cur == k) return vals(i)
      if (cur == EMPTY) return default
      i = (i + 1) & mask
    }
    default
  }

  def size: Int = used + (if (hasZero) 1 else 0)

  /** Iterate entries: f(key, value). Includes the zero-key slot last. */
  def foreachEntry(f: (Long, Double) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (keys(i) != EMPTY) f(keys(i), vals(i))
      i += 1
    }
    if (hasZero) f(0L, zeroVal)
  }

  private def grow(): Unit = {
    val oldKeys = keys
    val oldVals = vals
    cap <<= 1
    mask = cap - 1
    keys = new Array[Long](cap)
    vals = new Array[Double](cap)
    used = 0
    var i = 0
    while (i < oldKeys.length) {
      if (oldKeys(i) != EMPTY) {
        // direct re-insert (no zero-key path: zero never stored in arrays)
        var j = idx(oldKeys(i))
        while (keys(j) != EMPTY) j = (j + 1) & mask
        keys(j) = oldKeys(i); vals(j) = oldVals(i); used += 1
      }
      i += 1
    }
  }
}
