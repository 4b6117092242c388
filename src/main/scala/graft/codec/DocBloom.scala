package graft.codec

/** Per-block Bloom filter over doc ids — the point-lookup member of
  * the block-metadata family (zone maps prune by token VALUE, the
  * plan's partId bands prune by SOURCE; this prunes by DOCUMENT).
  * A `readDocsById` over a 10^12-document store decodes only the
  * blocks whose filter may contain a requested id: everything else
  * is rejected from a few hundred bytes of metadata, payload unread.
  *
  * Construction, probe schedule and wire layout live once in
  * [[BloomCore]]; this wrapper only supplies the key hash (FNV-1a
  * over the id string — deterministic across JVMs and rounds). A
  * null/empty filter (legacy blocks encoded before the column
  * existed) means "may contain anything" — correct, just unpruned,
  * matching the zone-map sentinel convention.
  */
object DocBloom {

  val BitsPerDoc: Int = BloomCore.BitsPerKey
  val Probes: Int = BloomCore.Probes

  private def h1Of(docId: String): Long = Hash.fnv64(docId)

  def build(docIds: Array[String], n: Int): Array[Byte] = {
    val bits = BloomCore.newTable(n)
    var r = 0
    while (r < n) {
      BloomCore.add(bits, h1Of(docIds(r)))
      r += 1
    }
    BloomCore.seal(bits)
  }

  /** No false negatives; null/empty filters answer true (legacy). */
  def mayContain(enc: Array[Byte], docId: String): Boolean =
    BloomCore.mayContain(enc, h1Of(docId))

  def mayContainAny(enc: Array[Byte], docIds: Seq[String]): Boolean =
    docIds.exists(mayContain(enc, _))
}
