package graft.codec

/** Per-block Bloom filter over distinct TOKEN VALUES — the secondary
  * index companion of [[DocBloom]] (zone maps prune by token RANGE,
  * partId bands by SOURCE, DocBloom by DOCUMENT; this prunes by token
  * MEMBERSHIP, the case a wide-zone block defeats: a "smooth"/"random"
  * regime block spans most of the value space, so any range predicate
  * intersects its zone, yet a specific token is almost never in it).
  *
  * Same double-hashing construction and wire layout as DocBloom
  * (varint m then m/8 bytes), keyed by splitmix64 over the int token
  * so filters stay deterministic across JVMs and rounds. A null/empty
  * filter means "may contain anything" — correct, just unpruned —
  * which is also the story for blocks the index skips (dict blocks
  * keep their EXACT symtab rejection; an approximate filter on top
  * would be strictly worse) and for blocks above the distinct cap.
  */
object TokBloom {

  val BitsPerKey = 10
  val Probes = 7

  private def h1Of(token: Int): Long =
    Hash.splitmix64(token.toLong ^ 0x9E3779B97F4A7C15L)

  private def mBitsFor(n: Int): Int = {
    val want = math.max(64L, n.toLong * BitsPerKey)
    var m = 64L
    while (m < want) m <<= 1
    math.min(m, 1L << 30).toInt
  }

  /** Build over the block's distinct tokens (first `n` of `distinct`). */
  def build(distinct: Array[Int], n: Int): Array[Byte] = {
    val m = mBitsFor(n)
    val mask = m - 1
    val bits = new Array[Byte](m >>> 3)
    var r = 0
    while (r < n) {
      val h1 = h1Of(distinct(r))
      val h2 = Hash.splitmix64(h1) | 1L
      var i = 0
      while (i < Probes) {
        val idx = ((h1 + i * h2) & Long.MaxValue).toInt & mask
        bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
        i += 1
      }
      r += 1
    }
    val out = new ByteBuf(bits.length + 5)
    out.writeVarInt(m)
    out.writeBytes(bits)
    out.toArray
  }

  /** No false negatives; null/empty filters answer true. */
  def mayContain(enc: Array[Byte], token: Int): Boolean = {
    if (enc == null || enc.length == 0) return true
    val r = new ByteReader(enc)
    val m = r.readVarInt()
    val mask = m - 1
    val base = r.pos
    val h1 = h1Of(token)
    val h2 = Hash.splitmix64(h1) | 1L
    var i = 0
    while (i < Probes) {
      val idx = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      if ((enc(base + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  def mayContainAny(enc: Array[Byte], tokens: Array[Int]): Boolean = {
    if (enc == null || enc.length == 0) return true
    var i = 0
    while (i < tokens.length) {
      if (mayContain(enc, tokens(i))) return true
      i += 1
    }
    false
  }

  def mayContainAll(enc: Array[Byte], tokens: Array[Int]): Boolean = {
    if (enc == null || enc.length == 0) return true
    var i = 0
    while (i < tokens.length) {
      if (!mayContain(enc, tokens(i))) return false
      i += 1
    }
    true
  }

  /** Range membership by per-value probing, only worthwhile for small
    * ranges: above `cap` values the filter abstains (answers true) —
    * the zone map is the range mechanism, this is the point mechanism.
    * Long arithmetic: hi - lo overflows Int for sentinel-wide ranges.
    */
  def mayIntersectRange(enc: Array[Byte], lo: Int, hi: Int,
                        cap: Int = 64): Boolean = {
    if (enc == null || enc.length == 0) return true
    if (hi.toLong - lo.toLong + 1L > cap.toLong) return true
    var t = lo
    while (t <= hi) {
      if (mayContain(enc, t)) return true
      if (t == hi) return false // avoid Int.MaxValue wrap
      t += 1
    }
    false
  }
}
