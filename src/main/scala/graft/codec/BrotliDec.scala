package graft.codec

/** From-scratch brotli decoder (RFC 7932, decode-only) — closes the
  * last unreadable reference fixture (`2cols6rows.csv.br`,
  * tests/fixtures/). No external library: the bit reader, prefix-code
  * machinery, meta-block state, context modeling, distance ring and
  * static-dictionary transforms are all implemented here from the
  * public specification.
  *
  * The three RFC data blobs ride as resources (they are normative
  * spec data, not code):
  *   - `graft/brotli/dict.bin` — the 122,784-byte static dictionary
  *     (RFC 7932 Appendix A)
  *   - `graft/brotli/transforms.tsv` — the 121 word transforms
  *     (RFC 7932 Appendix B): hex prefix, type id, hex suffix per line
  *   - `graft/brotli/context.bin` — the 2,048-byte context lookup
  *     table (RFC 7932 Section 7.3): four modes x (256 p1-lut +
  *     256 p2-lut)
  *
  * Decoded output is held fully in memory (the container-read path
  * hands whole files around anyway); window arithmetic still follows
  * WBITS so dictionary-vs-backward classification matches the spec.
  * Validated in BrotliSpec against a matrix of streams produced by
  * the reference encoder (quality 1/5/9/11, text/UTF-8/binary/
  * repetitive, 1 KB window wrap, multi-meta-block) plus the reference
  * repo's fixture.
  */
object BrotliDec {

  final class BrotliError(msg: String) extends RuntimeException(msg)
  private def err(msg: String): Nothing = throw new BrotliError(msg)

  // ---------------------------------------------------------------
  // bit reader: LSB-first within bytes (RFC 7932 §2); prefix codes
  // accumulate MSB-of-code-first like DEFLATE
  // ---------------------------------------------------------------
  private final class Reader(val buf: Array[Byte]) {
    var bit: Long = 0L
    def readBit(): Int = {
      val p = (bit >> 3).toInt
      if (p >= buf.length) err("unexpected end of stream")
      val b = (buf(p) >> (bit & 7).toInt) & 1
      bit += 1
      b
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    /** Peek up to n bits, zero-padded past end (for the fixed
      * code-length-code table reads).
      */
    def peekBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = ((bit + i) >> 3).toInt
        if (p < buf.length) v |= ((buf(p) >> ((bit + i) & 7).toInt) & 1) << i
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = bit += n
    def alignByte(): Unit = bit = (bit + 7) & ~7L
    def bytePos: Int = (bit >> 3).toInt
  }

  // ---------------------------------------------------------------
  // canonical prefix code (max length 15)
  // ---------------------------------------------------------------
  private final class Huff(lengths: Array[Int]) {
    // single-symbol trees read zero bits
    private val nonZero = lengths.indices.filter(lengths(_) > 0)
    val single: Int = if (nonZero.length == 1) nonZero.head else -1
    private val maxLen = if (nonZero.isEmpty) 0 else nonZero.map(lengths(_)).max
    private val count = new Array[Int](maxLen + 1)
    nonZero.foreach(s => count(lengths(s)) += 1)
    private val firstCode = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    locally {
      var code = 0
      var total = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        offset(l) = total
        code = (code + count(l)) << 1
        total += count(l)
        l += 1
      }
    }
    // symbols sorted by (length, symbol) — the canonical order
    private val sorted: Array[Int] =
      nonZero.sortBy(s => (lengths(s), s)).toArray
    def readSym(r: Reader): Int = {
      if (single >= 0) return single
      var code = 0
      var l = 0
      while (l < maxLen) {
        code = (code << 1) | r.readBit()
        l += 1
        val idx = code - firstCode(l)
        if (idx >= 0 && idx < count(l)) return sorted(offset(l) + idx)
      }
      err(s"invalid prefix code word (len > $maxLen)")
    }
  }

  // ---------------------------------------------------------------
  // spec tables
  // ---------------------------------------------------------------
  // fixed code for code-length code lengths (RFC 7932 §3.5): peek 4
  // bits LSB-first, (length, value) per index
  private val ClPrefixLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClPrefixVal = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // block count code (26 symbols): base, extra bits (RFC 7932 §6)
  private val BlockCountBase = Array(
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val BlockCountExtra = Array(
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  // insert length code (24): base, extra (RFC 7932 §5)
  private val InsBase = Array(
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  // copy length code (24): base, extra
  private val CopyBase = Array(
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  // the 11 insert-and-copy cells (symbol >> 6): high bits of the
  // insert / copy codes; cells 0-1 imply distance code 0 (RFC 7932 §5)
  private val CellInsHigh = Array(0, 0, 0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CellCopyHigh = Array(0, 8, 0, 8, 0, 8, 16, 0, 16, 8, 16)

  // distance short codes 0..15 (RFC 7932 §4): ring index, value delta
  private val ShortIdx = Array(0, 1, 2, 3, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1)
  private val ShortDelta = Array(0, 0, 0, 0, -1, 1, -2, 2, -3, 3, -1, 1, -2, 2, -3, 3)

  // static dictionary (RFC 7932 Appendix A): word counts per length
  private val DictSizeBits = Array(
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8,
    7, 7, 6, 6, 5, 5)
  private lazy val DictOffsets: Array[Int] = {
    val o = new Array[Int](DictSizeBits.length + 1)
    var i = 0
    while (i < DictSizeBits.length) {
      o(i + 1) = o(i) + (if (DictSizeBits(i) == 0) 0 else i * (1 << DictSizeBits(i)))
      i += 1
    }
    o
  }

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    if (in == null) err(s"missing brotli resource $name")
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = in.read(tmp)
      while (n > 0) { bos.write(tmp, 0, n); n = in.read(tmp) }
      bos.toByteArray
    } finally in.close()
  }

  private lazy val Dict: Array[Byte] = {
    val d = resource("dict.bin")
    if (d.length != 122784) err(s"dictionary blob size ${d.length} != 122784")
    d
  }
  /** context lookup (RFC 7932 §7.3): mode*512 + [0,256) for p1,
    * [256,512) for p2; modes LSB6=0, MSB6=1, UTF8=2, SIGNED=3
    */
  private lazy val CtxLut: Array[Byte] = {
    val t = resource("context.bin")
    if (t.length != 2048) err(s"context table size ${t.length} != 2048")
    t
  }
  /** 121 transforms (RFC 7932 Appendix B): (prefix, type, suffix);
    * types: 0 identity, 1 uppercase-first, 2 uppercase-all,
    * 3..11 omit-first-1..9, 12..20 omit-last-1..9
    */
  private[graft] lazy val Transforms: Array[(Array[Byte], Int, Array[Byte])] = {
    def unhex(s: String): Array[Byte] =
      if (s.isEmpty) Array.emptyByteArray
      else s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    val lines = new String(resource("transforms.tsv"), "US-ASCII")
      .split("\n").filter(_.nonEmpty)
    if (lines.length != 121) err(s"expected 121 transforms, got ${lines.length}")
    lines.map { l =>
      val p = l.split("\t", -1)
      (unhex(p(0)), p(1).toInt, unhex(p(2)))
    }
  }

  /** RFC 7932 §8 "ferment": uppercase one UTF-8 "character" in place,
    * returning its byte length (ASCII flips case bit; 2-byte sequences
    * flip bit 5 of the continuation; longer flip bit 0|4 (xor 5) of
    * the third byte — the spec's exact, deliberately quirky rule).
    */
  private def ferment(b: Array[Byte], pos: Int): Int = {
    val c = b(pos) & 0xFF
    if (c < 192) {
      if (c >= 'a' && c <= 'z') b(pos) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (pos + 1 < b.length) b(pos + 1) = ((b(pos + 1) & 0xFF) ^ 32).toByte
      2
    } else {
      if (pos + 2 < b.length) b(pos + 2) = ((b(pos + 2) & 0xFF) ^ 5).toByte
      3
    }
  }

  private[graft] def transformWord(word: Array[Byte], t: Int): Array[Byte] = {
    if (t >= Transforms.length) err(s"transform id $t out of range")
    val (pre, typ, suf) = Transforms(t)
    val core0: Array[Byte] = typ match {
      case 0 => word
      case 1 | 2 => word.clone()
      case k if k >= 3 && k <= 11 => word.drop(math.min(k - 2, word.length))
      case k if k >= 12 && k <= 20 => word.dropRight(math.min(k - 11, word.length))
      case other => err(s"unknown transform type $other")
    }
    if (typ == 1 && core0.nonEmpty) ferment(core0, 0)
    if (typ == 2) {
      var p = 0
      while (p < core0.length) p += ferment(core0, p)
    }
    val out = new Array[Byte](pre.length + core0.length + suf.length)
    System.arraycopy(pre, 0, out, 0, pre.length)
    System.arraycopy(core0, 0, out, pre.length, core0.length)
    System.arraycopy(suf, 0, out, pre.length + core0.length, suf.length)
    out
  }

  // ---------------------------------------------------------------
  // prefix-code reading (RFC 7932 §3.4-3.5)
  // ---------------------------------------------------------------
  private def readPrefixCode(r: Reader, alphabet: Int): Huff = {
    val hskip = r.readBits(2)
    if (hskip == 1) {
      // simple code: 1-4 explicit symbols
      val nsym = r.readBits(2) + 1
      val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(alphabet - 1))
      val syms = Array.fill(nsym)(r.readBits(bits))
      syms.foreach(s => if (s >= alphabet) err(s"simple-code symbol $s >= $alphabet"))
      if (syms.distinct.length != nsym) err("duplicate simple-code symbols")
      val lengths = new Array[Int](alphabet)
      nsym match {
        case 1 => lengths(syms(0)) = 15 // placeholder; single → 0 bits
        case 2 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case 4 =>
          if (r.readBit() == 0) syms.foreach(lengths(_) = 2)
          else {
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      new Huff(lengths)
    } else {
      // complex code: code-length code lengths in the fixed order,
      // starting at index hskip
      val clLen = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip
      while (i < 18 && space > 0) {
        val idx = r.peekBits(4)
        r.skip(ClPrefixLen(idx))
        val v = ClPrefixVal(idx)
        clLen(ClOrder(i)) = v
        if (v != 0) { space -= 32 >> v; numCodes += 1 }
        i += 1
      }
      if (numCodes != 1 && space != 0) err("corrupt code-length code")
      val clHuff = new Huff(clLen)
      // symbol code lengths via the code-length code with the 16/17
      // repeat accumulation rule
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var space2 = 32768
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      while (sym < alphabet && space2 > 0) {
        val cl = clHuff.readSym(r)
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) { prevLen = cl; space2 -= 32768 >> cl }
          repeat = 0 // any literal length breaks a repeat run
        } else {
          val extra = cl - 14 // 16→2, 17→3
          val newLen = if (cl == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val old = repeat
          if (repeat > 0) repeat = (repeat - 2) << extra
          repeat += r.readBits(extra) + 3
          val delta = repeat - old
          if (sym + delta > alphabet) err("repeat past alphabet end")
          var j = 0
          while (j < delta) { lengths(sym) = repeatLen; sym += 1; j += 1 }
          if (repeatLen != 0) space2 -= delta << (15 - repeatLen)
        }
      }
      if (space2 < 0) err("over-subscribed prefix code")
      if (space2 != 0) {
        // under-subscribed is only legal as a single-symbol code
        val nz = lengths.count(_ > 0)
        if (nz != 1) err("under-subscribed prefix code")
      }
      new Huff(lengths)
    }
  }

  private def decodeVarLenUint8(r: Reader): Int =
    if (r.readBit() == 0) 0
    else {
      val n = r.readBits(3)
      if (n == 0) 1 else (1 << n) + r.readBits(n)
    }

  private def readContextMap(r: Reader, size: Int, ntrees: Int): Array[Byte] = {
    val map = new Array[Byte](size)
    if (ntrees <= 1) return map
    val rleMax = if (r.readBit() == 0) 0 else r.readBits(4) + 1
    val huff = readPrefixCode(r, ntrees + rleMax)
    var i = 0
    while (i < size) {
      val sym = huff.readSym(r)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        var reps = (1 << sym) + r.readBits(sym)
        if (i + reps > size) err("context-map RLE past end")
        while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
      } else {
        map(i) = (sym - rleMax).toByte
        i += 1
      }
    }
    if (r.readBit() == 1) {
      // inverse move-to-front over the map values
      val mtf = Array.tabulate(256)(_.toByte)
      var k = 0
      while (k < size) {
        val idx = map(k) & 0xFF
        val v = mtf(idx)
        var j = idx
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
        map(k) = v
        k += 1
      }
    }
    map
  }

  // per-category block-switch state
  private final class BlockCat(r: Reader) {
    val nbltypes: Int = decodeVarLenUint8(r) + 1
    private val typeHuff: Huff =
      if (nbltypes >= 2) readPrefixCode(r, nbltypes + 2) else null
    private val countHuff: Huff =
      if (nbltypes >= 2) readPrefixCode(r, 26) else null
    var btype: Int = 0
    private var prevType: Int = 1
    var remaining: Long =
      if (nbltypes >= 2) readCount(r) else Long.MaxValue
    private def readCount(rr: Reader): Long = {
      val s = countHuff.readSym(rr)
      BlockCountBase(s).toLong + rr.readBits(BlockCountExtra(s))
    }
    def maybeSwitch(rr: Reader): Unit = {
      if (remaining == 0L) {
        val sym = typeHuff.readSym(rr)
        val next = sym match {
          case 0 => prevType
          case 1 => (btype + 1) % nbltypes
          case s => s - 2
        }
        if (next >= nbltypes) err("block type out of range")
        prevType = btype
        btype = next
        remaining = readCount(rr)
      }
      remaining -= 1
    }
  }

  // ---------------------------------------------------------------
  // top level
  // ---------------------------------------------------------------
  def decompress(input: Array[Byte]): Array[Byte] = {
    val r = new Reader(input)
    // WBITS (RFC 7932 §9.1)
    val wbits =
      if (r.readBit() == 0) 16
      else {
        val n = r.readBits(3)
        if (n != 0) 17 + n
        else {
          val m = r.readBits(3)
          if (m == 0) 17
          else if (m == 1) err("reserved WBITS pattern (large-window brotli unsupported)")
          else 8 + m
        }
      }
    val windowSize = (1 << wbits) - 16
    var outArr = new Array[Byte](64 << 10) // grows; also serves copies
    var outLen = 0
    def append(b: Byte): Unit = {
      if (outLen == outArr.length)
        outArr = java.util.Arrays.copyOf(outArr, outArr.length * 2)
      outArr(outLen) = b
      outLen += 1
    }
    // distance ring buffer: most recent last-written; initial contents
    // per RFC 7932 §4 (last, 2nd, 3rd, 4th) = (4, 11, 15, 16)
    val ring = Array(16, 15, 11, 4)
    var ringPos = 0 // next write slot; most recent is (ringPos+3)&3
    def lastDist(k: Int): Int = ring((ringPos + 3 - k) & 3) // k=0 most recent
    def pushDist(d: Int): Unit = { ring(ringPos) = d; ringPos = (ringPos + 1) & 3 }

    var isLast = false
    while (!isLast) {
      isLast = r.readBit() == 1
      if (isLast && r.readBit() == 1) {
        // ISLASTEMPTY
      } else {
        val mnibbles = r.readBits(2) match {
          case 3 => 0
          case v => v + 4
        }
        if (mnibbles == 0) {
          // metadata block (skipped content)
          if (r.readBit() != 0) err("reserved metadata bit set")
          val mskipBytes = r.readBits(2)
          var skipLen = 0
          var i = 0
          while (i < mskipBytes) {
            val b = r.readBits(8)
            if (i + 1 == mskipBytes && mskipBytes > 1 && b == 0)
              err("exuberant metadata skip length")
            skipLen |= b << (8 * i)
            i += 1
          }
          if (mskipBytes > 0) skipLen += 1
          r.alignByte()
          if (r.bytePos + skipLen > input.length)
            err("metadata skip past end of stream")
          r.skip(skipLen * 8)
        } else {
          var mlen = 0L
          var i = 0
          while (i < mnibbles) {
            val nib = r.readBits(4)
            if (i + 1 == mnibbles && mnibbles > 4 && nib == 0)
              err("exuberant MNIBBLES")
            mlen |= nib.toLong << (4 * i)
            i += 1
          }
          mlen += 1
          val uncompressed = !isLast && r.readBit() == 1
          if (uncompressed) {
            r.alignByte()
            val start = r.bytePos
            if (start + mlen > input.length) err("uncompressed block past end")
            var j = 0
            while (j < mlen) { append(input(start + j)); j += 1 }
            r.skip((mlen * 8).toInt)
          } else {
            decodeCompressedMetaBlock(r, mlen, windowSize, append _,
              () => outArr, () => outLen, lastDist _, pushDist _)
          }
        }
      }
    }
    java.util.Arrays.copyOf(outArr, outLen)
  }

  /** One compressed meta-block (RFC 7932 §9.3). */
  private def decodeCompressedMetaBlock(
      r: Reader, mlen: Long, windowSize: Int, append: Byte => Unit,
      outArr: () => Array[Byte], outLen: () => Int,
      lastDist: Int => Int, pushDist: Int => Unit): Unit = {
    val catL = new BlockCat(r)
    val catI = new BlockCat(r)
    val catD = new BlockCat(r)
    val npostfix = r.readBits(2)
    val ndirect = r.readBits(4) << npostfix
    val postfixMask = (1 << npostfix) - 1
    val cmodes = Array.fill(catL.nbltypes)(r.readBits(2))
    val ntreesL = decodeVarLenUint8(r) + 1
    val cmapL = readContextMap(r, 64 * catL.nbltypes, ntreesL)
    val ntreesD = decodeVarLenUint8(r) + 1
    val cmapD = readContextMap(r, 4 * catD.nbltypes, ntreesD)
    val litTrees = Array.fill(ntreesL)(readPrefixCode(r, 256))
    val icTrees = Array.fill(catI.nbltypes)(readPrefixCode(r, 704))
    val distAlphabet = 16 + ndirect + (48 << npostfix)
    val distTrees = Array.fill(ntreesD)(readPrefixCode(r, distAlphabet))

    var produced = 0L
    while (produced < mlen) {
      catI.maybeSwitch(r)
      val icSym = icTrees(catI.btype).readSym(r)
      val cell = icSym >> 6
      val insCode = CellInsHigh(cell) + ((icSym >> 3) & 7)
      val copyCode = CellCopyHigh(cell) + (icSym & 7)
      var insLen = InsBase(insCode) + r.readBits(InsExtra(insCode))
      val copyLen = CopyBase(copyCode) + r.readBits(CopyExtra(copyCode))
      // literals
      while (insLen > 0) {
        catL.maybeSwitch(r)
        val n = outLen()
        val arr = outArr()
        val p1 = if (n > 0) arr(n - 1) & 0xFF else 0
        val p2 = if (n > 1) arr(n - 2) & 0xFF else 0
        val mode = cmodes(catL.btype)
        val ctx = (CtxLut((mode << 9) + p1) & 0xFF) |
          (CtxLut((mode << 9) + 256 + p2) & 0xFF)
        val tree = litTrees(cmapL(catL.btype * 64 + ctx) & 0xFF)
        append(tree.readSym(r).toByte)
        produced += 1
        insLen -= 1
      }
      if (produced > mlen) err("insert length past meta-block end")
      if (produced == mlen) return // copy part ignored at exact fill
      // distance
      val maxBackward = math.min(windowSize.toLong, outLen().toLong)
      var distCodeZero = cell < 2
      val distance: Long =
        if (distCodeZero) lastDist(0).toLong
        else {
          catD.maybeSwitch(r)
          val ctx = math.min(copyLen, 5) - 2
          val dsym = distTrees(cmapD(catD.btype * 4 + ctx) & 0xFF).readSym(r)
          if (dsym == 0) { distCodeZero = true; lastDist(0).toLong }
          else if (dsym < 16) {
            val d = lastDist(ShortIdx(dsym)).toLong + ShortDelta(dsym)
            if (d <= 0) err("non-positive short-code distance")
            d
          } else if (dsym < 16 + ndirect) (dsym - 16 + 1).toLong
          else {
            val x = dsym - ndirect - 16
            val ndistbits = 1 + (x >> (npostfix + 1))
            val hcode = x >> npostfix
            val lcode = x & postfixMask
            val offset = ((2 + (hcode & 1)) << ndistbits) - 4
            (((offset.toLong + r.readBits(ndistbits)) << npostfix) +
              lcode + ndirect + 1)
          }
        }
      if (distance <= maxBackward) {
        if (!distCodeZero) pushDist(distance.toInt)
        if (produced + copyLen > mlen) err("copy past meta-block end")
        var j = 0
        while (j < copyLen) {
          val arr = outArr()
          append(arr(outLen() - distance.toInt))
          j += 1
        }
        produced += copyLen
      } else {
        // static dictionary reference (RFC 7932 §8)
        if (copyLen < 4 || copyLen > 24 || DictSizeBits(copyLen) == 0)
          err(s"dictionary reference with invalid length $copyLen")
        val address = distance - maxBackward - 1
        val ndbits = DictSizeBits(copyLen)
        val wordIdx = (address & ((1L << ndbits) - 1)).toInt
        val transformIdx = (address >> ndbits).toInt
        if (transformIdx >= Transforms.length)
          err(s"transform index $transformIdx out of range")
        val word = new Array[Byte](copyLen)
        System.arraycopy(Dict, DictOffsets(copyLen) + wordIdx * copyLen,
          word, 0, copyLen)
        val outWord = transformWord(word, transformIdx)
        if (produced + outWord.length > mlen) err("dictionary word past meta-block end")
        outWord.foreach(append)
        produced += outWord.length
      }
    }
  }

  /** Whole-stream convenience over an InputStream (the container-read
    * integration point; brotli has no internal framing to stream on,
    * and container files are handed around whole in this engine).
    */
  def decompressStream(in: java.io.InputStream): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](65536)
    var n = in.read(tmp)
    while (n > 0) { bos.write(tmp, 0, n); n = in.read(tmp) }
    decompress(bos.toByteArray)
  }
}
