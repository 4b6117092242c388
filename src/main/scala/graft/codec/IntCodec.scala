package graft.codec

/** Lightweight integer codecs over a block's concatenated token stream.
  *
  * Each codec is a pure `Array[Int] -> (symtab, payload)` kernel with a
  * symmetric decode; losslessness is the invariant the reference states
  * as round-trip format-conversion equality (undatum README.rst + its
  * fixtures corpus), re-expressed here per BASELINE.json as
  * `decode(encode(x)) == x` element-for-element.
  *
  * Width/dictionary heuristics descend from the reference:
  *  - int-width minimization: undatum/utils.py:106-111
  *  - dictionary-key detection (uniq share): undatum/cmds/statistics.py:104-110
  */
final case class Encoded(symtab: Array[Byte], payload: Array[Byte])

trait IntCodec extends Serializable {
  def id: Int
  def name: String
  /** Encode; returns null when this codec cannot represent the input
    * (e.g. negative values for unsigned packing) — caller falls back.
    */
  def encode(values: Array[Int], n: Int): Encoded
  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int]
}

object CodecIds {
  val Plain = 0
  val Dict = 1
  val Rle = 2
  val BitPack = 3
  val For = 4
  val Fsst = 5
  val DeltaFor = 6
  val MiniPack = 7
  val Pfor = 8
  val names: Map[Int, String] = Map(
    Plain -> "plain", Dict -> "dict", Rle -> "rle", BitPack -> "bitpack",
    For -> "for", Fsst -> "fsst", DeltaFor -> "deltafor",
    MiniPack -> "minipack", Pfor -> "pfor")
}

/** Raw 4-byte little-endian values — the universal fallback. */
object PlainCodec extends IntCodec {
  val id = CodecIds.Plain
  val name = "plain"
  def encode(values: Array[Int], n: Int): Encoded = {
    val out = new ByteBuf(n * 4 + 8)
    var i = 0
    while (i < n) { out.writeIntLE(values(i)); i += 1 }
    Encoded(Array.emptyByteArray, out.toArray)
  }
  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val r = new ByteReader(payload)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = r.readIntLE(); i += 1 }
    out
  }
}

/** LSB-first bit-packing at width(max) — requires non-negative input. */
object BitPackCodec extends IntCodec {
  val id = CodecIds.BitPack
  val name = "bitpack"
  def encode(values: Array[Int], n: Int): Encoded = {
    var max = 0
    var i = 0
    while (i < n) { val v = values(i); if (v < 0) return null; if (v > max) max = v; i += 1 }
    val w = Bits.widthInt(max)
    val out = new ByteBuf(n * w / 8 + 16)
    val longs = new Array[Long](n)
    i = 0
    while (i < n) { longs(i) = values(i).toLong; i += 1 }
    Bits.pack(longs, n, w, out)
    Encoded(Array(w.toByte), out.toArray)
  }
  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val w = symtab(0) & 0xFF
    val longs = Bits.unpack(new ByteReader(payload), n, w)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = longs(i).toInt; i += 1 }
    out
  }
}

/** Frame-of-reference: subtract min, bit-pack the deltas. Handles any
  * int range (deltas computed in Long).
  */
object ForCodec extends IntCodec {
  val id = CodecIds.For
  val name = "for"
  def encode(values: Array[Int], n: Int): Encoded = {
    if (n == 0) return Encoded(Array[Byte](0, 0, 0, 0, 0), Array.emptyByteArray)
    var min = values(0); var max = values(0)
    var i = 1
    while (i < n) {
      val v = values(i)
      if (v < min) min = v
      if (v > max) max = v
      i += 1
    }
    val range = max.toLong - min.toLong
    val w = Bits.width(range)
    val st = new ByteBuf(5)
    st.writeIntLE(min)
    st.writeByte(w)
    val longs = new Array[Long](n)
    i = 0
    while (i < n) { longs(i) = values(i).toLong - min.toLong; i += 1 }
    val out = new ByteBuf(n * w / 8 + 16)
    Bits.pack(longs, n, w, out)
    Encoded(st.toArray, out.toArray)
  }
  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val r = new ByteReader(symtab)
    val min = r.readIntLE()
    val w = r.readByte()
    val longs = Bits.unpack(new ByteReader(payload), n, w)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = (longs(i) + min.toLong).toInt; i += 1 }
    out
  }
}

/** Delta + zigzag with per-miniblock bit widths (Parquet
  * DELTA_BINARY_PACKED-style, public format): wins on near-sorted or
  * smoothly-varying streams. Miniblocks of 128 deltas each carry their
  * own width, so occasional wide jumps (doc boundaries in a
  * concatenated block stream) don't inflate the whole block.
  */
object DeltaForCodec extends IntCodec {
  val id = CodecIds.DeltaFor
  val name = "deltafor"
  private val Mini = 128

  def encode(values: Array[Int], n: Int): Encoded = {
    if (n == 0) return Encoded(Array[Byte](0, 0, 0, 0), Array.emptyByteArray)
    val st = new ByteBuf(4)
    st.writeIntLE(values(0))
    val out = new ByteBuf(n + 16)
    val zz = new Array[Long](Mini)
    var i = 1
    while (i < n) {
      val m = math.min(Mini, n - i)
      var maxZ = 0L
      var k = 0
      while (k < m) {
        val d = values(i + k).toLong - values(i + k - 1).toLong
        val z = (d << 1) ^ (d >> 63)
        zz(k) = z
        if (z > maxZ) maxZ = z
        k += 1
      }
      val w = Bits.width(maxZ) // <= 33 for int deltas
      out.writeByte(w)
      Bits.pack(zz, m, w, out)
      i += m
    }
    Encoded(st.toArray, out.toArray)
  }

  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    if (n == 0) return out
    out(0) = new ByteReader(symtab).readIntLE()
    val r = new ByteReader(payload)
    var prev = out(0).toLong
    var i = 1
    while (i < n) {
      val m = math.min(Mini, n - i)
      val w = r.readByte()
      val zz = Bits.unpack(r, m, w)
      var k = 0
      while (k < m) {
        val z = zz(k)
        prev += (z >>> 1) ^ -(z & 1L)
        out(i + k) = prev.toInt
        k += 1
      }
      i += m
    }
    out
  }
}

/** Per-miniblock bit-packing (the non-delta sibling of DeltaFor's
  * miniblock format): 128-value miniblocks each carry their own bit
  * width, so a block that concatenates documents from different value
  * regimes (4-bit next to 12-bit next to a lone 31-bit outlier) pays
  * the LOCAL width per miniblock instead of the global width(max) for
  * every token. Requires non-negative input (null otherwise).
  */
object MiniPackCodec extends IntCodec {
  val id = CodecIds.MiniPack
  val name = "minipack"
  private val Mini = 128

  def encode(values: Array[Int], n: Int): Encoded = {
    val out = new ByteBuf(n + 16)
    val longs = new Array[Long](Mini)
    var i = 0
    while (i < n) {
      val m = math.min(Mini, n - i)
      var max = 0
      var k = 0
      while (k < m) {
        val v = values(i + k)
        if (v < 0) return null
        if (v > max) max = v
        longs(k) = v.toLong
        k += 1
      }
      val w = Bits.widthInt(max)
      out.writeByte(w)
      Bits.pack(longs, m, w, out)
      i += m
    }
    Encoded(Array.emptyByteArray, out.toArray)
  }

  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    val r = new ByteReader(payload)
    var i = 0
    while (i < n) {
      val m = math.min(Mini, n - i)
      val w = r.readByte()
      val longs = Bits.unpack(r, m, w)
      var k = 0
      while (k < m) { out(i + k) = longs(k).toInt; k += 1 }
      i += m
    }
    out
  }
}

/** Dictionary encoding: sorted distinct values in the symbol table
  * (delta-varint), bit-packed indexes as payload. Bails out (null) when
  * cardinality exceeds 1<<16 — selection should not have picked it.
  */
object DictCodec extends IntCodec {
  val id = CodecIds.Dict
  val name = "dict"
  val maxCard = 1 << 16

  def encode(values: Array[Int], n: Int): Encoded = {
    val set = new IntSet(1024)
    var i = 0
    while (i < n) {
      if (set.add(values(i)) && set.size > maxCard) return null
      i += 1
    }
    val dict = set.toSortedArray
    val k = dict.length
    val st = new ByteBuf(k * 2 + 8)
    st.writeVarInt(k)
    var prev = 0L
    i = 0
    while (i < k) {
      if (i == 0) st.writeZigZag(dict(0))
      else st.writeVarLong(dict(i).toLong - prev) // sorted => non-negative delta
      prev = dict(i).toLong
      i += 1
    }
    val w = Bits.widthInt(math.max(k - 1, 0))
    val longs = new Array[Long](n)
    i = 0
    while (i < n) {
      longs(i) = java.util.Arrays.binarySearch(dict, values(i)).toLong
      i += 1
    }
    val out = new ByteBuf(n * w / 8 + 16)
    Bits.pack(longs, n, w, out)
    val stArr = st.toArray
    val head = new ByteBuf(stArr.length + 1)
    head.writeByte(w)
    head.writeBytes(stArr)
    Encoded(head.toArray, out.toArray)
  }

  /** Sorted distinct values from a Dict block's symbol table — a few
    * KB at most (card <= 1<<16), decoded WITHOUT touching the payload.
    * Compressed-domain membership tests (graft.encode.CompressedSearch)
    * use this to reject whole blocks from the symtab alone.
    */
  def readDict(symtab: Array[Byte]): Array[Int] = {
    val r = new ByteReader(symtab)
    r.readByte() // index bit width
    val k = r.readVarInt()
    val dict = new Array[Int](k)
    var i = 0
    var prev = 0L
    while (i < k) {
      if (i == 0) { dict(0) = r.readZigZag(); prev = dict(0).toLong }
      else { prev += r.readVarLong(); dict(i) = prev.toInt }
      i += 1
    }
    dict
  }

  /** The payload's per-index bit width (symtab header byte). */
  def indexWidth(symtab: Array[Byte]): Int = symtab(0) & 0xFF

  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val dict = readDict(symtab)
    val longs = Bits.unpack(new ByteReader(payload), n, indexWidth(symtab))
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = dict(longs(i).toInt); i += 1 }
    out
  }
}

/** Patched frame-of-reference (PFOR): pack EVERY value at a base
  * width chosen to cover most of the stream, and patch the few wider
  * "exception" values from a separate (position-delta varint, high
  * bits varint) list. The classic lightweight-codec answer to the
  * long-tail token distribution: a Zipf vocabulary puts 90-99% of
  * token ids under a narrow width with rare large ids that would
  * force BitPack to width(max) for every token and that MiniPack can
  * only contain to their 128-value miniblock. Base width is chosen
  * EXACTLY from the full width histogram by minimizing
  * body+exception bytes (O(32) after one O(n) pass, with the
  * position-delta bytes estimated from the exception density).
  * Requires non-negative input (null otherwise, like BitPack).
  */
object PforCodec extends IntCodec {
  val id = CodecIds.Pfor
  val name = "pfor"

  private def varintBytes(v: Long): Int =
    if (v == 0L) 1 else (63 - java.lang.Long.numberOfLeadingZeros(v)) / 7 + 1

  def encode(values: Array[Int], n: Int): Encoded = {
    if (n == 0) return Encoded(Array[Byte](0), Array.emptyByteArray)
    val whist = new Array[Long](33)
    var i = 0
    while (i < n) {
      val v = values(i)
      if (v < 0) return null
      whist(Bits.widthInt(v)) += 1
      i += 1
    }
    var maxW = 32
    while (maxW > 0 && whist(maxW) == 0) maxW -= 1
    // pick the base width minimizing body + exception bytes
    var bestW = maxW
    var bestSize = Long.MaxValue
    var w = 0
    while (w <= maxW) {
      var exc = 0L
      var excBytes = 0L
      var b = w + 1
      while (b <= maxW) {
        exc += whist(b)
        // high bits have width b-w -> ceil((b-w)/7) varint bytes
        excBytes += whist(b) * ((b - w + 6) / 7)
        b += 1
      }
      val posBytes =
        if (exc == 0) 0L
        else exc * varintBytes(n.toLong / exc) // avg position gap
      val size = (n.toLong * w + 7) / 8 + posBytes + excBytes + 4
      if (size < bestSize) { bestSize = size; bestW = w }
      w += 1
    }
    val bw = bestW
    val mask = if (bw == 0) 0L else (1L << bw) - 1L
    val longs = new Array[Long](n)
    i = 0
    while (i < n) { longs(i) = values(i).toLong & mask; i += 1 }
    val out = new ByteBuf((n.toLong * bw / 8 + 16).toInt)
    Bits.pack(longs, n, bw, out)
    // exception section: count, then (position delta, high bits) pairs
    var exc = 0
    i = 0
    while (i < n) { if (Bits.widthInt(values(i)) > bw) exc += 1; i += 1 }
    out.writeVarInt(exc)
    var prev = 0
    i = 0
    while (i < n) {
      if (Bits.widthInt(values(i)) > bw) {
        out.writeVarInt(i - prev)
        out.writeVarInt(values(i) >>> bw)
        prev = i
      }
      i += 1
    }
    Encoded(Array(bw.toByte), out.toArray)
  }

  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    if (n == 0) return Array.emptyIntArray // n==0 encode wrote no bytes
    val bw = symtab(0) & 0xFF
    val r = new ByteReader(payload)
    val longs = Bits.unpack(r, n, bw)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = longs(i).toInt; i += 1 }
    val exc = r.readVarInt()
    var pos = 0
    i = 0
    while (i < exc) {
      pos += r.readVarInt()
      out(pos) |= r.readVarInt() << bw
      i += 1
    }
    out
  }
}

/** Run-length encoding: (zigzag value, varint run-length) pairs. */
object RleCodec extends IntCodec {
  val id = CodecIds.Rle
  val name = "rle"
  def encode(values: Array[Int], n: Int): Encoded = {
    val out = new ByteBuf(64)
    var i = 0
    while (i < n) {
      val v = values(i)
      var run = 1
      while (i + run < n && values(i + run) == v) run += 1
      out.writeZigZag(v)
      out.writeVarInt(run)
      i += run
    }
    Encoded(Array.emptyByteArray, out.toArray)
  }
  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val r = new ByteReader(payload)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val v = r.readZigZag()
      val run = r.readVarInt()
      var k = 0
      while (k < run) { out(i + k) = v; k += 1 }
      i += run
    }
    out
  }
}
