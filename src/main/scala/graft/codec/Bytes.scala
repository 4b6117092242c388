package graft.codec

import java.util.Arrays

/** Byte-level primitives shared by all codecs: growable output buffer,
  * LEB128 varints, zigzag, and LSB-first bit-packing. Pure JVM, no
  * Spark dependency — invoked from `mapPartitions`/`flatMapGroups`
  * kernels so everything here must be allocation-lean.
  */
final class ByteBuf(initial: Int = 64) {
  private var buf = new Array[Byte](math.max(initial, 16))
  private var len = 0

  def size: Int = len

  private def ensure(extra: Int): Unit = {
    if (len + extra > buf.length) {
      var cap = buf.length * 2
      while (cap < len + extra) cap *= 2
      buf = Arrays.copyOf(buf, cap)
    }
  }

  def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }

  def writeBytes(bs: Array[Byte]): Unit = {
    ensure(bs.length); System.arraycopy(bs, 0, buf, len, bs.length); len += bs.length
  }

  def writeBytes(bs: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(bs, off, buf, len, n); len += n
  }

  def writeIntLE(v: Int): Unit = {
    ensure(4)
    buf(len) = v.toByte
    buf(len + 1) = (v >>> 8).toByte
    buf(len + 2) = (v >>> 16).toByte
    buf(len + 3) = (v >>> 24).toByte
    len += 4
  }

  def writeLongLE(v: Long): Unit = { writeIntLE(v.toInt); writeIntLE((v >>> 32).toInt) }

  /** Unsigned LEB128 of the low 32 bits. */
  def writeVarInt(v: Int): Unit = writeVarLong(v.toLong & 0xFFFFFFFFL)

  def writeVarLong(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) { writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    writeByte(v.toInt)
  }

  def writeZigZag(v: Int): Unit = writeVarLong(((v << 1) ^ (v >> 31)).toLong & 0xFFFFFFFFL)

  def toArray: Array[Byte] = Arrays.copyOf(buf, len)
}

final class ByteReader(val buf: Array[Byte], var pos: Int = 0) {
  def readByte(): Int = { val b = buf(pos) & 0xFF; pos += 1; b }

  def readIntLE(): Int = {
    val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
      ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
    pos += 4; v
  }

  def readLongLE(): Long =
    (readIntLE().toLong & 0xFFFFFFFFL) | (readIntLE().toLong << 32)

  def readVarLong(): Long = {
    var v = 0L; var shift = 0
    var b = readByte()
    while ((b & 0x80) != 0) { v |= (b & 0x7F).toLong << shift; shift += 7; b = readByte() }
    v | (b.toLong << shift)
  }

  def readVarInt(): Int = readVarLong().toInt

  def readZigZag(): Int = { val z = readVarLong().toInt; (z >>> 1) ^ -(z & 1) }

  def remaining: Int = buf.length - pos
}

/** Growable primitive int array — hot encode paths must not box. */
final class IntBuf(initial: Int = 64) {
  private var arr = new Array[Int](math.max(initial, 16))
  private var len = 0
  def size: Int = len
  def apply(i: Int): Int = arr(i)
  def add(v: Int): Unit = {
    if (len == arr.length) arr = Arrays.copyOf(arr, arr.length * 2)
    arr(len) = v
    len += 1
  }
  /** Backing array; valid up to `size`. */
  def raw: Array[Int] = arr
}

/** Open-addressing int hash set (linear probing, no deletes) — the
  * boxing-free replacement for HashSet[Integer] in per-token loops.
  * One sentinel slot handles the value 0.
  */
final class IntSet(expected: Int = 16) {
  private var cap = Integer.highestOneBit(math.max(16, expected * 2) - 1) << 1
  private var keys = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0
  def size: Int = n
  private def idx(v: Int): Int = {
    var h = v * 0x9E3779B9
    h ^= h >>> 16
    var i = h & (cap - 1)
    while (used(i) && keys(i) != v) i = (i + 1) & (cap - 1)
    i
  }
  /** Returns true when v was newly added. */
  def add(v: Int): Boolean = {
    val i = idx(v)
    if (used(i)) return false
    used(i) = true
    keys(i) = v
    n += 1
    if (n * 4 > cap * 3) grow()
    true
  }
  def contains(v: Int): Boolean = used(idx(v))
  private def grow(): Unit = {
    val ok = keys; val ou = used; val oc = cap
    cap *= 2
    keys = new Array[Int](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < oc) { if (ou(i)) add(ok(i)); i += 1 }
  }
  /** Sorted snapshot of the members. */
  def toSortedArray: Array[Int] = {
    val out = new Array[Int](n)
    var i = 0; var j = 0
    while (i < cap) { if (used(i)) { out(j) = keys(i); j += 1 }; i += 1 }
    Arrays.sort(out)
    out
  }
}

object Bits {
  /** Minimal width in bits to represent unsigned value v (0 for v==0). */
  def width(v: Long): Int =
    if (v == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)

  def widthInt(v: Int): Int = if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(v)

  /** Pack n values (given as Longs in [0, 2^w), w <= 56) LSB-first.
    * The width cap is the single-long refill path's limit: unpack
    * refills `readByte << accBits`, which drops a byte's high bits
    * once accBits > 56 — widths 57..63 would silently corrupt. All
    * current codecs stay far under (max 34 via DeltaFor's zigzag).
    */
  def pack(values: Array[Long], n: Int, w: Int, out: ByteBuf): Unit = {
    if (w == 0) return
    require(w <= 56, s"pack width $w (max 56 — see refill note)")
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < n) {
      val v = values(i)
      acc |= (v << accBits) // accBits < 64 always holds here
      accBits += w
      if (accBits >= 64) {
        var k = 0
        while (k < 8) { out.writeByte((acc & 0xFF).toInt); acc >>>= 8; k += 1 }
        accBits -= 64
        acc = if (accBits > 0) v >>> (w - accBits) else 0L
      }
      while (accBits >= 8) { out.writeByte((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
      i += 1
    }
    while (accBits > 0) { out.writeByte((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
  }

  /** Inverse of pack: read n values at w bits each. */
  def unpack(r: ByteReader, n: Int, w: Int): Array[Long] = {
    val out = new Array[Long](n)
    if (w == 0) return out
    require(w <= 56, s"unpack width $w (max 56 — see pack note)")
    val mask = (1L << w) - 1L
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < n) {
      while (accBits < w) { acc |= (r.readByte().toLong << accBits); accBits += 8 }
      out(i) = acc & mask
      acc >>>= w
      accBits -= w
      i += 1
    }
    out
  }
}
