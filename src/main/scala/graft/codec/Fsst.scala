package graft.codec

import scala.collection.mutable.ArrayBuffer

/** Simplified FSST-style symbol-table compression over token streams.
  *
  * Real FSST (Boncz/Lang/Neumann, VLDB 2020 — public paper; see
  * PAPERS.md) compresses strings with a 255-entry table of 1-8 byte
  * symbols plus an escape code. Tokens are ints, not strings, so we
  * first serialize the block's token stream as unsigned LEB128 varints
  * and run FSST-style training/encoding over that byte stream —
  * repeated 3-8-token phrases become repeated byte substrings the
  * symbol table captures. This is the re-targeting of the reference's
  * "repeated subsequences" compression opportunity (BASELINE.json);
  * the reference itself only picked whole-file codecs
  * (undatum/cmds/converter.py:362-414).
  *
  * Codes 0..254 = symbols, 255 = escape (next byte is a literal).
  * Training: 4 rounds of greedy parse + pair-concatenation candidate
  * generation, keep top-255 by gain = freq * length (deterministic
  * tie-break on byte content).
  */
object FsstCodec extends IntCodec {
  val id = CodecIds.Fsst
  val name = "fsst"

  private val MaxSymbols = 255
  private val Escape = 255
  private val MaxSymLen = 8
  private val SampleBytes = 1 << 16
  private val Rounds = 4

  /** Tokens -> unsigned LEB128 byte stream. */
  private def toVarintBytes(values: Array[Int], n: Int): Array[Byte] = {
    val out = new ByteBuf(n * 2 + 16)
    var i = 0
    while (i < n) { out.writeVarInt(values(i)); i += 1 }
    out.toArray
  }

  /** A trained table: symbols bucketed by first byte, longest first —
    * greedy parse touches one array cell + a few key compares per
    * position instead of up to 8 hash lookups.
    */
  private final class Table(val syms: Array[Array[Byte]]) {
    // per first-byte: parallel arrays of (packed key, length, code),
    // sorted by length descending
    val bucketKeys: Array[Array[Long]] = new Array(256)
    val bucketLens: Array[Array[Int]] = new Array(256)
    val bucketCodes: Array[Array[Int]] = new Array(256)
    locally {
      val tmp = Array.fill(256)(new ArrayBuffer[(Long, Int, Int)]())
      var c = 0
      while (c < syms.length) {
        val s = syms(c)
        tmp(s(0) & 0xFF) += ((packKey(s, 0, s.length), s.length, c))
        c += 1
      }
      var b = 0
      while (b < 256) {
        val sorted = tmp(b).sortBy(-_._2)
        bucketKeys(b) = sorted.map(_._1).toArray
        bucketLens(b) = sorted.map(_._2).toArray
        bucketCodes(b) = sorted.map(_._3).toArray
        b += 1
      }
    }
  }

  private def packKey(b: Array[Byte], off: Int, len: Int): Long = {
    var k = 0L
    var i = 0
    while (i < len) { k |= (b(off + i) & 0xFFL) << (8 * i); i += 1 }
    k
  }

  /** Greedy longest-match parse; emits codes (0..254) or 256+byte for
    * literals.
    */
  private def parse(bytes: Array[Byte], table: Table, out: IntBuf): Unit = {
    val n = bytes.length
    var p = 0
    while (p < n) {
      val b0 = bytes(p) & 0xFF
      val keys = table.bucketKeys(b0)
      var matched = -1
      var mLen = 0
      if (keys.length > 0) {
        val lens = table.bucketLens(b0)
        val avail = n - p
        // packed window once per position (8 bytes max)
        val wLen = math.min(8, avail)
        val window = packKey(bytes, p, wLen)
        var i = 0
        while (i < keys.length && matched < 0) {
          val l = lens(i)
          if (l <= avail) {
            val mask = if (l == 8) -1L else (1L << (8 * l)) - 1L
            if ((window & mask) == keys(i)) { matched = table.bucketCodes(b0)(i); mLen = l }
          }
          i += 1
        }
      }
      if (matched >= 0) { out.add(matched); p += mLen }
      else { out.add(256 + b0); p += 1 }
    }
  }

  private def train(bytes: Array[Byte]): Table = {
    val sample =
      if (bytes.length <= SampleBytes) bytes
      else java.util.Arrays.copyOf(bytes, SampleBytes)
    var table = new Table(Array.empty)
    var round = 0
    while (round < Rounds) {
      val codes = new IntBuf(sample.length)
      parse(sample, table, codes)
      // count singles and adjacent pairs
      val nCodeSpace = 512
      val count1 = new Array[Int](nCodeSpace)
      val count2 = new java.util.HashMap[java.lang.Long, Integer]()
      var i = 0
      while (i < codes.size) {
        count1(codes(i)) += 1
        if (i + 1 < codes.size) {
          val key = codes(i).toLong * nCodeSpace + codes(i + 1)
          val old = count2.get(key)
          count2.put(key, if (old == null) 1 else old + 1)
        }
        i += 1
      }
      def codeBytes(c: Int): Array[Byte] =
        if (c >= 256) Array((c - 256).toByte) else table.syms(c)
      // candidates: existing symbols, frequent single bytes, frequent pairs
      // gain ~ bytes covered (freq * len); singles gain freq * 1
      val cands = new ArrayBuffer[(Long, Array[Byte])]()
      var c = 0
      while (c < nCodeSpace) {
        if (count1(c) > 0) {
          val b = if (c >= 256 || c < table.syms.length) codeBytes(c) else null
          if (b != null) cands += ((count1(c).toLong * b.length, b))
        }
        c += 1
      }
      val it = count2.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cnt = e.getValue.intValue()
        if (cnt >= 2) {
          val k = e.getKey.longValue()
          val c1 = (k / nCodeSpace).toInt
          val c2 = (k % nCodeSpace).toInt
          val valid1 = c1 >= 256 || c1 < table.syms.length
          val valid2 = c2 >= 256 || c2 < table.syms.length
          if (valid1 && valid2) {
            val b1 = codeBytes(c1); val b2 = codeBytes(c2)
            if (b1.length + b2.length <= MaxSymLen) {
              val b = new Array[Byte](b1.length + b2.length)
              System.arraycopy(b1, 0, b, 0, b1.length)
              System.arraycopy(b2, 0, b, b1.length, b2.length)
              cands += ((cnt.toLong * b.length, b))
            }
          }
        }
      }
      // dedupe by byte content, keep max gain; deterministic ordering
      val best = new java.util.HashMap[String, (Long, Array[Byte])]()
      cands.foreach { case (g, b) =>
        val key = java.util.Arrays.toString(b)
        val old = best.get(key)
        if (old == null || old._1 < g) best.put(key, (g, b))
      }
      val sorted = best.values().toArray(Array.empty[(Long, Array[Byte])])
        .sortBy { case (g, b) => (-g, java.util.Arrays.toString(b)) }
      table = new Table(sorted.take(MaxSymbols).map(_._2))
      round += 1
    }
    table
  }

  /** Cheap size estimate: encode only a prefix sample and extrapolate
    * bytes-per-token. Used by auto-selection to skip the (expensive)
    * full FSST trial when another codec is already clearly smaller.
    */
  def estimateBytes(values: Array[Int], n: Int): Long = {
    val sampleN = math.min(n, 16384)
    if (sampleN == 0) return 1L
    var i = 0
    while (i < sampleN) { if (values(i) < 0) return Long.MaxValue; i += 1 }
    val sample = java.util.Arrays.copyOf(values, sampleN)
    val e = encode(sample, sampleN)
    if (e == null) return Long.MaxValue
    // extrapolate payload only; the symbol table is a fixed cost, not
    // a per-token one
    val perTok = e.payload.length.toDouble / sampleN
    math.ceil(perTok * n).toLong + e.symtab.length
  }

  def encode(values: Array[Int], n: Int): Encoded = {
    var i = 0
    while (i < n) { if (values(i) < 0) return null; i += 1 }
    val bytes = toVarintBytes(values, n)
    if (bytes.length == 0)
      return Encoded(Array[Byte](0), Array.emptyByteArray)
    val table = train(bytes)
    val codes = new IntBuf(bytes.length / 2 + 16)
    parse(bytes, table, codes)
    val out = new ByteBuf(codes.size + 16)
    var j = 0
    while (j < codes.size) {
      val c = codes(j)
      if (c >= 256) { out.writeByte(Escape); out.writeByte(c - 256) }
      else out.writeByte(c)
      j += 1
    }
    val st = new ByteBuf(300)
    st.writeByte(table.syms.length)
    table.syms.foreach { s => st.writeByte(s.length); st.writeBytes(s) }
    Encoded(st.toArray, out.toArray)
  }

  def decode(symtab: Array[Byte], payload: Array[Byte], n: Int): Array[Int] = {
    val r = new ByteReader(symtab)
    val k = r.readByte()
    val syms = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) {
      val len = r.readByte()
      val b = new Array[Byte](len)
      System.arraycopy(symtab, r.pos, b, 0, len)
      r.pos += len
      syms(i) = b
      i += 1
    }
    // expand codes -> byte stream
    val bytes = new ByteBuf(payload.length * 3 + 16)
    var p = 0
    while (p < payload.length) {
      val c = payload(p) & 0xFF
      if (c == Escape) { bytes.writeByte(payload(p + 1) & 0xFF); p += 2 }
      else { bytes.writeBytes(syms(c)); p += 1 }
    }
    val br = new ByteReader(bytes.toArray)
    val out = new Array[Int](n)
    i = 0
    while (i < n) { out(i) = br.readVarInt(); i += 1 }
    out
  }
}
