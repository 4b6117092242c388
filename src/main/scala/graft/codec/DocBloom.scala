package graft.codec

/** Per-block Bloom filter over doc ids — the point-lookup member of
  * the block-metadata family (zone maps prune by token VALUE, the
  * plan's partId bands prune by SOURCE; this prunes by DOCUMENT).
  * A `readDocsById` over a 10^12-document store decodes only the
  * blocks whose filter may contain a requested id: everything else
  * is rejected from a few hundred bytes of metadata, payload unread.
  *
  * Standard double-hashing construction (Kirsch & Mitzenmacher 2006:
  * g_i = h1 + i·h2 indexes one m-bit array): ~10 bits/doc, k = 7
  * probes → ~1% false positives, no false negatives ever. Hashes
  * derive from the repo's own FNV-1a `hash64` + the splitmix64
  * finalizer, so filters are deterministic across JVMs and rounds.
  *
  * Wire layout: varint m (bit count, power of two) followed by m/8
  * raw bytes. A null/empty filter (legacy blocks encoded before the
  * column existed) means "may contain anything" — correct, just
  * unpruned, matching the zone-map sentinel convention.
  */
object DocBloom {

  val BitsPerDoc = 10
  val Probes = 7

  private def mix(z0: Long): Long = Hash.splitmix64(z0)

  private def fnv64(s: String): Long = Hash.fnv64(s)

  private def mBitsFor(n: Int): Int = {
    val want = math.max(64L, n.toLong * BitsPerDoc)
    var m = 64L
    while (m < want) m <<= 1
    math.min(m, 1L << 30).toInt // 128 MiB hard cap; blocks are ~10^3-10^5 rows
  }

  def build(docIds: Array[String], n: Int): Array[Byte] = {
    val m = mBitsFor(n)
    val mask = m - 1
    val bits = new Array[Byte](m >>> 3)
    var r = 0
    while (r < n) {
      val h1 = fnv64(docIds(r))
      val h2 = mix(h1) | 1L // odd stride: full cycle over the power-of-two table
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

  /** No false negatives; null/empty filters answer true (legacy). */
  def mayContain(enc: Array[Byte], docId: String): Boolean = {
    if (enc == null || enc.length == 0) return true
    val r = new ByteReader(enc)
    val m = r.readVarInt()
    val mask = m - 1
    val base = r.pos
    val h1 = fnv64(docId)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < Probes) {
      val idx = ((h1 + i * h2) & Long.MaxValue).toInt & mask
      if ((enc(base + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  def mayContainAny(enc: Array[Byte], docIds: Seq[String]): Boolean =
    docIds.exists(mayContain(enc, _))
}
