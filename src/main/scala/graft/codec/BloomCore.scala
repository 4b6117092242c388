package graft.codec

/** THE bloom kernel behind [[DocBloom]] (string doc ids) and
  * [[TokBloom]] (int tokens): standard double-hashing construction
  * (Kirsch & Mitzenmacher 2006: g_i = h1 + i·h2 over one m-bit
  * power-of-two table), ~10 bits/key, k = 7 probes → ~1% false
  * positives, no false negatives ever. Callers supply the
  * already-hashed 64-bit key; everything downstream of that hash —
  * sizing, probe schedule, wire layout (varint m then m/8 raw
  * bytes) — lives HERE once, so a probe-count or layout fix cannot
  * land in one filter family and miss the other. The layout is
  * frozen: persisted docBloomEnc columns and tokidx tables must stay
  * readable across rounds.
  */
private[codec] object BloomCore {

  val BitsPerKey = 10
  val Probes = 7

  def mBitsFor(n: Int): Int = {
    val want = math.max(64L, n.toLong * BitsPerKey)
    var m = 64L
    while (m < want) m <<= 1
    math.min(m, 1L << 30).toInt // 128 MiB hard cap
  }

  /** Allocate a table for `n` keys; fill via [[add]], seal via [[seal]]. */
  def newTable(n: Int): Array[Byte] = new Array[Byte](mBitsFor(n) >>> 3)

  def add(bits: Array[Byte], h1: Long): Unit = {
    val mask = (bits.length << 3) - 1
    val h2 = Hash.splitmix64(h1) | 1L // odd stride: full cycle
    var i = 0
    while (i < Probes) {
      val idx = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  def seal(bits: Array[Byte]): Array[Byte] = {
    val out = new ByteBuf(bits.length + 5)
    out.writeVarInt(bits.length << 3)
    out.writeBytes(bits)
    out.toArray
  }

  /** No false negatives; null/empty filters answer true (legacy /
    * abstaining blocks). A corrupt/truncated filter (e.g. a mangled
    * tokidx row — the index is documented as an accelerator, never a
    * correctness dependency) must ABSTAIN, not throw: m is validated
    * as a positive power of two whose m/8 payload bytes fit the
    * buffer before any probe indexes into it.
    */
  def mayContain(enc: Array[Byte], h1: Long): Boolean = {
    if (enc == null || enc.length == 0) return true
    val r = new ByteReader(enc)
    val m = try r.readVarInt() catch {
      case _: IndexOutOfBoundsException => return true // truncated varint
    }
    val base = r.pos
    if (m <= 0 || (m & (m - 1)) != 0 ||
      base.toLong + (m >>> 3) > enc.length) return true
    val mask = m - 1
    val h2 = Hash.splitmix64(h1) | 1L
    var i = 0
    while (i < Probes) {
      val idx = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      if ((enc(base + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }
}
