package graft.codec

/** Per-block Bloom filter over distinct TOKEN VALUES — the secondary
  * index companion of [[DocBloom]] (zone maps prune by token RANGE,
  * partId bands by SOURCE, DocBloom by DOCUMENT; this prunes by token
  * MEMBERSHIP, the case a wide-zone block defeats: a "smooth"/"random"
  * regime block spans most of the value space, so any range predicate
  * intersects its zone, yet a specific token is almost never in it).
  *
  * Construction, probe schedule and wire layout live once in
  * [[BloomCore]]; this wrapper only supplies the key hash (splitmix64
  * over the int token). A null/empty filter means "may contain
  * anything" — which is also the story for blocks the index skips
  * (dict blocks keep their EXACT symtab rejection; an approximate
  * filter on top would be strictly worse) and for blocks above the
  * distinct cap.
  */
object TokBloom {

  val BitsPerKey: Int = BloomCore.BitsPerKey
  val Probes: Int = BloomCore.Probes

  private def h1Of(token: Int): Long =
    Hash.splitmix64(token.toLong ^ 0x9E3779B97F4A7C15L)

  /** Build over the block's distinct tokens (first `n` of `distinct`). */
  def build(distinct: Array[Int], n: Int): Array[Byte] = {
    val bits = BloomCore.newTable(n)
    var r = 0
    while (r < n) {
      BloomCore.add(bits, h1Of(distinct(r)))
      r += 1
    }
    BloomCore.seal(bits)
  }

  /** No false negatives; null/empty filters answer true. */
  def mayContain(enc: Array[Byte], token: Int): Boolean =
    BloomCore.mayContain(enc, h1Of(token))

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
