package graft.codec

/** The repo's two deterministic scalar hashes, defined ONCE.
  *
  * Every serialized artifact that bakes a hash into bytes on disk
  * (block Bloom filters, encode-plan salting, simhash/minhash
  * signatures, synthetic corpora) routes through these — a constant
  * or width change here is a store-format change, never a silent
  * per-module drift.
  */
object Hash {

  /** FNV-1a 64-bit over a char range — stable across JVMs,
    * independent of String.hashCode.
    */
  def fnv64Range(s: String, from: Int, to: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < to) { h ^= (s.charAt(i) & 0xFFFFL); h *= 0x100000001b3L; i += 1 }
    h
  }

  def fnv64(s: String): Long = fnv64Range(s, 0, s.length)

  /** splitmix64 finalizer (Steele et al., "Fast Splittable
    * Pseudorandom Number Generators", OOPSLA'14 public constants).
    */
  def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
