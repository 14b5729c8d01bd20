package graft.functions

/** Primitive open-addressing hash structures for aggregate buffers.
  *
  * A `TypedImperativeAggregate`'s `update` runs once per input ROW, so
  * a buffer built on `java.util.HashMap`/`HashSet` pays a
  * `java.lang.Long` box allocation per row (Long.valueOf caches only
  * |v| <= 127 — ids and hashes never hit the cache). At sf100 that is
  * ~1e9 allocations per aggregate, which the decade runs measured as
  * the single-group sketch wall (q132/q133 at ~60 s). These tables
  * store raw longs in flat arrays with an occupancy bitmap (any long
  * value is legal — no sentinel), linear probing, load factor <= 1/2,
  * and a splitmix-style finalizer so adversarially-regular key sets
  * (sequential ids) still spread.
  */
final class LongHashSet(initialBits: Int = 4) {
  private var bits = math.max(4, initialBits)
  private var mask = (1 << bits) - 1
  private var keys = new Array[Long](1 << bits)
  private var occ = new Array[Long]((1 << bits) / 64 + 1)
  private var n = 0

  def size: Int = n

  @inline private def occupied(i: Int): Boolean =
    (occ(i >>> 6) & (1L << (i & 63))) != 0L
  @inline private def setOcc(i: Int): Unit =
    occ(i >>> 6) |= 1L << (i & 63)

  /** @return true iff the value was newly added */
  def add(v: Long): Boolean = {
    var i = PrimitiveHash.mix(v) & mask
    while (occupied(i)) {
      if (keys(i) == v) return false
      i = (i + 1) & mask
    }
    keys(i) = v; setOcc(i); n += 1
    if (n * 2 > keys.length) grow()
    true
  }

  def contains(v: Long): Boolean = {
    var i = PrimitiveHash.mix(v) & mask
    while (occupied(i)) {
      if (keys(i) == v) return true
      i = (i + 1) & mask
    }
    false
  }

  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) f(keys(i))
      i += 1
    }
  }

  private def grow(): Unit = {
    val oldKeys = keys
    val oldOcc = occ
    bits += 1
    mask = (1 << bits) - 1
    keys = new Array[Long](1 << bits)
    occ = new Array[Long]((1 << bits) / 64 + 1)
    var i = 0
    while (i < oldKeys.length) {
      if ((oldOcc(i >>> 6) & (1L << (i & 63))) != 0L) {
        var j = PrimitiveHash.mix(oldKeys(i)) & mask
        while (occupied(j)) j = (j + 1) & mask
        keys(j) = oldKeys(i); setOcc(j)
      }
      i += 1
    }
  }
}

/** Long-keyed map with object values (e.g. bitmap containers). */
final class LongObjHashMap[V <: AnyRef](initialBits: Int = 4) {
  private var bits = math.max(4, initialBits)
  private var mask = (1 << bits) - 1
  private var keys = new Array[Long](1 << bits)
  private var vals = new Array[AnyRef](1 << bits)
  private var occ = new Array[Long]((1 << bits) / 64 + 1)
  private var n = 0

  def size: Int = n

  @inline private def occupied(i: Int): Boolean =
    (occ(i >>> 6) & (1L << (i & 63))) != 0L
  @inline private def setOcc(i: Int): Unit =
    occ(i >>> 6) |= 1L << (i & 63)

  def getOrNull(k: Long): V = {
    var i = PrimitiveHash.mix(k) & mask
    while (occupied(i)) {
      if (keys(i) == k) return vals(i).asInstanceOf[V]
      i = (i + 1) & mask
    }
    null.asInstanceOf[V]
  }

  def put(k: Long, v: V): Unit = {
    var i = PrimitiveHash.mix(k) & mask
    while (occupied(i)) {
      if (keys(i) == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = v; setOcc(i); n += 1
    if (n * 2 > keys.length) grow()
  }

  def foreach(f: (Long, V) => Unit): Unit = {
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) f(keys(i), vals(i).asInstanceOf[V])
      i += 1
    }
  }

  /** Keys in ascending order (for deterministic state presentation). */
  def sortedKeys(): Array[Long] = {
    val out = new Array[Long](n)
    var w = 0
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) { out(w) = keys(i); w += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  private def grow(): Unit = {
    val oldKeys = keys
    val oldVals = vals
    val oldOcc = occ
    bits += 1
    mask = (1 << bits) - 1
    keys = new Array[Long](1 << bits)
    vals = new Array[AnyRef](1 << bits)
    occ = new Array[Long]((1 << bits) / 64 + 1)
    var i = 0
    while (i < oldKeys.length) {
      if ((oldOcc(i >>> 6) & (1L << (i & 63))) != 0L) {
        var j = PrimitiveHash.mix(oldKeys(i)) & mask
        while (occupied(j)) j = (j + 1) & mask
        keys(j) = oldKeys(i); vals(j) = oldVals(i); setOcc(j)
      }
      i += 1
    }
  }
}

/** Long-keyed map of long sums: `addTo` is the one hot operation. */
final class LongLongHashMap(initialBits: Int = 4) {
  private var bits = math.max(4, initialBits)
  private var mask = (1 << bits) - 1
  private var keys = new Array[Long](1 << bits)
  private var vals = new Array[Long](1 << bits)
  private var occ = new Array[Long]((1 << bits) / 64 + 1)
  private var n = 0

  def size: Int = n

  @inline private def occupied(i: Int): Boolean =
    (occ(i >>> 6) & (1L << (i & 63))) != 0L
  @inline private def setOcc(i: Int): Unit =
    occ(i >>> 6) |= 1L << (i & 63)

  def addTo(k: Long, delta: Long): Unit = {
    var i = PrimitiveHash.mix(k) & mask
    while (occupied(i)) {
      if (keys(i) == k) { vals(i) += delta; return }
      i = (i + 1) & mask
    }
    keys(i) = k; vals(i) = delta; setOcc(i); n += 1
    if (n * 2 > keys.length) grow()
  }

  def get(k: Long): Long = {
    var i = PrimitiveHash.mix(k) & mask
    while (occupied(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    0L
  }

  def foreach(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) f(keys(i), vals(i))
      i += 1
    }
  }

  def sortedKeys(): Array[Long] = {
    val out = new Array[Long](n)
    var w = 0
    var i = 0
    while (i < keys.length) {
      if (occupied(i)) { out(w) = keys(i); w += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  private def grow(): Unit = {
    val oldKeys = keys
    val oldVals = vals
    val oldOcc = occ
    bits += 1
    mask = (1 << bits) - 1
    keys = new Array[Long](1 << bits)
    vals = new Array[Long](1 << bits)
    occ = new Array[Long]((1 << bits) / 64 + 1)
    var i = 0
    while (i < oldKeys.length) {
      if ((oldOcc(i >>> 6) & (1L << (i & 63))) != 0L) {
        var j = PrimitiveHash.mix(oldKeys(i)) & mask
        while (occupied(j)) j = (j + 1) & mask
        keys(j) = oldKeys(i); vals(j) = oldVals(i); setOcc(j)
      }
      i += 1
    }
  }
}

object PrimitiveHash {
  /** murmur3 fmix64 — full-avalanche finalizer so regular key sets
    * (sequential ids, strided offsets) spread across the table.
    */
  @inline def mix(z0: Long): Int = {
    var z = (z0 ^ (z0 >>> 33)) * 0xFF51AFD7ED558CCDL
    z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
    (z ^ (z >>> 33)).toInt
  }
}
