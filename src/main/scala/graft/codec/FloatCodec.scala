package graft.codec

/** Lossless float32 block compression for vector columns (embeddings)
  * — the per-column lightweight-compression idea extended from token
  * ints to floats. Bit-exact round trip is the invariant: values are
  * treated as 32-bit images (floatToRawIntBits), so every NaN payload,
  * -0.0f and denormal survives unchanged.
  *
  * Two kernels + auto-selection by trial (same philosophy as
  * BlockCodec.encodeAuto — encode the candidates, keep the smallest):
  *
  *  - SHUFFLE: byte-plane transpose (all byte-0s, then byte-1s, ...)
  *    before zstd — the Blosc/HDF5 trick. Random-ish embedding values
  *    have near-incompressible mantissa bytes but highly clustered
  *    sign/exponent bytes; grouping planes lets zstd exploit that
  *    instead of seeing a 4-byte mix.
  *  - XOR: Gorilla-style (Facebook's time-series format, VLDB'15)
  *    re-sized for 32-bit floats: XOR with the previous value, emit
  *    '0' for identical, else leading-zeros window control + the
  *    meaningful bits. Wins on smooth/repetitive series (per-dim
  *    deltas, quantized values), loses on isotropic noise — the trial
  *    decides.
  *  - PLAIN: raw little-endian images (+zstd when it helps) — the
  *    fallback that bounds worst-case size at ~4n.
  *
  * Container layout: [codecId: u8][zstdFlag: u8][varint n][payload].
  */
object FloatCodec {

  val Plain = 0
  val Shuffle = 1
  val Xor = 2
  val names: Map[Int, String] = Map(Plain -> "plain", Shuffle -> "shuffle", Xor -> "xor")

  /** zstd level shared with the int-block post-pass. */
  private def zstdLevel: Int = BlockCodec.ZstdLevel

  // ---- MSB-first bit IO (XOR kernel needs variable-width fields) ----

  /** Word-based MSB-first writer: fields append into a 64-bit
    * accumulator and flush whole bytes — an order of magnitude faster
    * than bit-at-a-time for the XOR kernel's hot loop. Stale bits
    * above the live `nbits` are masked at every emit, and the byte
    * layout is identical to a bit-at-a-time MSB-first writer.
    */
  private final class BitWriter(initial: Int = 256) {
    private val out = new ByteBuf(initial)
    private var acc = 0L
    private var nbits = 0
    /** w <= 32; after each flush nbits < 8, so nbits + w <= 39 < 64. */
    def write(v: Long, w: Int): Unit = {
      acc = (acc << w) | (v & (if (w == 0) 0L else (1L << w) - 1))
      nbits += w
      while (nbits >= 8) {
        nbits -= 8
        out.writeByte(((acc >>> nbits) & 0xFF).toInt)
      }
    }
    def writeBit(b: Int): Unit = write(b.toLong, 1)
    def toArray: Array[Byte] = {
      if (nbits > 0) {
        out.writeByte(((acc << (8 - nbits)) & 0xFF).toInt)
        acc = 0L
        nbits = 0
      }
      out.toArray
    }
  }

  private final class BitReader(buf: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    def read(w: Int): Long = {
      while (nbits < w) { acc = (acc << 8) | (buf(pos) & 0xFF); pos += 1; nbits += 8 }
      nbits -= w
      (acc >>> nbits) & (if (w == 0) 0L else (1L << w) - 1)
    }
    def readBit(): Int = read(1).toInt
  }

  // ---- kernels (payload only; container added by encodeAuto) ----

  private def plainBytes(values: Array[Float], n: Int): Array[Byte] = {
    val out = new ByteBuf(n * 4 + 8)
    var i = 0
    while (i < n) { out.writeIntLE(java.lang.Float.floatToRawIntBits(values(i))); i += 1 }
    out.toArray
  }

  private def unplain(payload: Array[Byte], n: Int): Array[Float] = {
    val r = new ByteReader(payload)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = java.lang.Float.intBitsToFloat(r.readIntLE()); i += 1 }
    out
  }

  private def shuffleBytes(values: Array[Float], n: Int): Array[Byte] = {
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToRawIntBits(values(i))
      out(i) = bits.toByte
      out(n + i) = (bits >>> 8).toByte
      out(2 * n + i) = (bits >>> 16).toByte
      out(3 * n + i) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  private def unshuffle(payload: Array[Byte], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val bits = (payload(i) & 0xFF) | ((payload(n + i) & 0xFF) << 8) |
        ((payload(2 * n + i) & 0xFF) << 16) | ((payload(3 * n + i) & 0xFF) << 24)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    out
  }

  private def xorBytes(values: Array[Float], n: Int): Array[Byte] = {
    val w = new BitWriter(n + 16)
    var prev = 0
    var prevLead = -1
    var prevMean = 0 // meaningful-bit count of the previous window
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToRawIntBits(values(i))
      if (i == 0) w.write(bits.toLong & 0xFFFFFFFFL, 32)
      else {
        val x = bits ^ prev
        if (x == 0) w.writeBit(0)
        else {
          w.writeBit(1)
          val lead = Integer.numberOfLeadingZeros(x)
          val trail = Integer.numberOfTrailingZeros(x)
          val mean = 32 - lead - trail
          if (prevLead >= 0 && lead >= prevLead &&
              32 - prevLead - prevMean <= trail) {
            // fits the previous window: control '0' + meaningful bits
            // at the previous (lead, length)
            w.writeBit(0)
            w.write((x >>> (32 - prevLead - prevMean)).toLong & ((1L << prevMean) - 1),
              prevMean)
          } else {
            // new window: control '1' + 5-bit lead + 5-bit (len-1)
            w.writeBit(1)
            w.write(lead.toLong, 5)
            w.write((mean - 1).toLong, 5)
            w.write((x >>> trail).toLong & ((1L << mean) - 1), mean)
            prevLead = lead
            prevMean = mean
          }
        }
      }
      prev = bits
      i += 1
    }
    w.toArray
  }

  private def unxor(payload: Array[Byte], n: Int): Array[Float] = {
    val out = new Array[Float](n)
    if (n == 0) return out
    val r = new BitReader(payload)
    var prev = r.read(32).toInt
    out(0) = java.lang.Float.intBitsToFloat(prev)
    var prevLead = -1
    var prevMean = 0
    var i = 1
    while (i < n) {
      if (r.readBit() == 1) {
        if (r.readBit() == 1) {
          prevLead = r.read(5).toInt
          prevMean = r.read(5).toInt + 1
        }
        val m = r.read(prevMean).toInt
        prev ^= m << (32 - prevLead - prevMean)
      }
      out(i) = java.lang.Float.intBitsToFloat(prev)
      i += 1
    }
    out
  }

  // ---- container ----

  private def seal(codecId: Int, n: Int, payload: Array[Byte],
                   zstd: Boolean): Array[Byte] = {
    val (flag, body) =
      if (zstd && payload.length > 64) {
        val z = com.github.luben.zstd.Zstd.compress(payload, zstdLevel)
        if (z.length < payload.length) (1, z) else (0, payload)
      } else (0, payload)
    val out = new ByteBuf(body.length + 8)
    out.writeByte(codecId)
    out.writeByte(flag)
    out.writeVarInt(n)
    out.writeBytes(body)
    out.toArray
  }

  /** Force one kernel (diagnostics / per-kernel tests). */
  def encodeAs(codecId: Int, values: Array[Float], n: Int,
               zstd: Boolean = true): Array[Byte] = codecId match {
    case Plain => seal(Plain, n, plainBytes(values, n), zstd)
    case Shuffle => seal(Shuffle, n, shuffleBytes(values, n), zstd)
    case Xor => seal(Xor, n, xorBytes(values, n), zstd)
    case other => throw new IllegalArgumentException(s"unknown float codec $other")
  }

  /** Encode with auto-selection: trial shuffle / xor / plain, keep the
    * smallest FINAL (post-zstd) container. Deterministic.
    */
  def encodeAuto(values: Array[Float], n: Int, zstd: Boolean = true): Array[Byte] = {
    // sampled gate (the BlockCodec FSST-estimate pattern): XOR on
    // isotropic noise runs near 32+ bits/value and can never beat the
    // byte-plane shuffle there — skip its full trial when sampling
    // shows it uncompetitive. The sample is STRIDED (four 1024-value
    // windows at 0, n/4, n/2, 3n/4), not a prefix, so a block mixing a
    // noisy head with a compressible tail still averages under the
    // threshold when XOR would win overall; each window is an exact
    // XOR encode, and the mean of window rates estimates the
    // full-block rate.
    val tryXor = n <= 4096 || {
      val w = 1024
      val starts = Seq(0, n / 4, n / 2, 3 * n / 4).map(math.min(_, n - w))
      val bytes = starts.map { s =>
        val win = java.util.Arrays.copyOfRange(values, s, s + w)
        xorBytes(win, w).length
      }.sum
      bytes.toDouble / (starts.size * w) < 3.5 // < 28 bits/value
    }
    val cands =
      (Seq(Shuffle -> shuffleBytes(values, n)) ++
        (if (tryXor) Seq(Xor -> xorBytes(values, n)) else Nil) ++
        Seq(Plain -> plainBytes(values, n)))
        .map { case (cid, p) => seal(cid, n, p, zstd) }
    cands.minBy(_.length)
  }

  def decode(block: Array[Byte]): Array[Float] = {
    val r = new ByteReader(block)
    val cid = r.readByte()
    val flag = r.readByte()
    val n = r.readVarInt()
    val body = java.util.Arrays.copyOfRange(block, r.pos, block.length)
    val payload = if (flag == 1) BlockCodec.unzstd(body) else body
    cid match {
      case Plain => unplain(payload, n)
      case Shuffle => unshuffle(payload, n)
      case Xor => unxor(payload, n)
      case other => throw new IllegalArgumentException(s"unknown float codec $other")
    }
  }

  /** Codec id of a sealed block (diagnostics). */
  def codecOf(block: Array[Byte]): Int = block(0) & 0xFF
}
