package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}

/** From-scratch reader for the FLAT-RECORD subset of Python pickle
  * streams (the shape the reference's fixture corpus ships as
  * `2cols6rows_flat.pickle`: one `pickle.dump`ed flat dict per record,
  * concatenated — the pattern the external `iterabledata` package
  * reads; the reference's own `common/iterable.py:128-139` dispatch
  * covers csv/jsonl/bson only, so this is fixture-matrix completion,
  * not reference-core parity).
  *
  * This is a data decoder, NOT a pickle VM: only the opcodes needed
  * for flat dicts / lists of flat dicts with scalar values are
  * implemented, and anything that would reconstruct objects or run
  * code (GLOBAL, STACK_GLOBAL, REDUCE, BUILD, INST, OBJ, NEWOBJ,
  * EXT*, PERSID...) is REFUSED with a clear error naming the opcode —
  * both a scope statement and the safety stance (pickle's
  * arbitrary-code surface stays closed).
  *
  * Supported: protocols 0-5 framing (PROTO, FRAME), dicts
  * (EMPTY_DICT/DICT/SETITEM/SETITEMS), lists
  * (EMPTY_LIST/LIST/APPEND/APPENDS), the memo
  * (PUT/BINPUT/LONG_BINPUT/MEMOIZE/GET/BINGET/LONG_BINGET — pickle
  * protocol ≥2 memoizes every string, and a list-of-dicts pickle
  * back-references repeated keys), strings (SHORT_BINUNICODE,
  * BINUNICODE, BINUNICODE8, UNICODE), ints (BININT, BININT1, BININT2,
  * LONG1, LONG4, INT), floats (BINFLOAT, FLOAT), bools, None, bytes
  * (SHORT_BINBYTES, BINBYTES, BINBYTES8 → base64, same convention as
  * [[BsonLocal]] binary), and STOP.
  *
  * Each top-level pickle yields its dict as one JSON line; a pickle
  * whose top value is a list of dicts yields one line per element.
  * Values decode through Spark's JSON inference — the same tail as the
  * bson/xlsx paths, so a pickled record and its jsonl twin produce
  * identical DataFrames.
  */
object PickleLocal {

  private object Mark // stack sentinel for MARK

  /** Decode a concatenated-pickle byte stream to JSON lines. */
  def toJsonLines(bytes: Array[Byte]): Iterator[String] = new Iterator[String] {
    private var off = 0
    private val pending = scala.collection.mutable.Queue.empty[String]

    // look-ahead in hasNext: a pickle may legitimately yield ZERO
    // lines (an empty list), so "more bytes" does not imply "more
    // records" — decode until a line lands or input runs out
    override def hasNext: Boolean = {
      while (pending.isEmpty && off < bytes.length) {
        val (value, end) =
          try runOne(bytes, off)
          catch {
            // bounds = truncated stream; NoSuchElement/NPE = stack or
            // memo underflow (e.g. SETITEM on an empty stack, BINGET of
            // a memo slot a mis-ordered PUT left null) — all surface as
            // the documented IllegalArgumentException with context, not
            // a bare collection fault out of an executor task
            case e @ (_: IndexOutOfBoundsException |
                      _: java.util.NoSuchElementException |
                      _: NullPointerException) =>
              throw new IllegalArgumentException(
                s"corrupt pickle: malformed opcode stream at offset $off", e)
          }
        off = end
        value match {
          case m: java.util.LinkedHashMap[_, _] => pending += renderDict(m)
          case l: java.util.ArrayList[_] =>
            l.forEach {
              case m: java.util.LinkedHashMap[_, _] => pending += renderDict(m)
              case other => refuse(s"top-level list element is " +
                s"${if (other == null) "None" else other.getClass.getSimpleName}" +
                " (flat-dict records expected)")
            }
          case other => refuse("top-level value is " +
            s"${if (other == null) "None" else other.getClass.getSimpleName}" +
            " (flat dict or list of flat dicts expected)")
        }
      }
      pending.nonEmpty
    }

    override def next(): String = {
      if (!hasNext) throw new NoSuchElementException("end of pickle stream")
      pending.dequeue()
    }
  }

  private def refuse(what: String): Nothing =
    throw new IllegalArgumentException(s"unsupported pickle: $what")

  /** One pickle: opcode walk from `start` to its STOP; returns the top
    * value and the offset just past STOP.
    */
  private def runOne(b: Array[Byte], start: Int): (AnyRef, Int) = {
    var off = start
    val stack = new java.util.ArrayDeque[AnyRef]()
    // ONE memo namespace, exactly CPython's unpickler: PUT/BINPUT store
    // at an explicit id, MEMOIZE stores at len(memo) — so streams mixing
    // the forms resolve identically here and there
    val memo = new java.util.HashMap[Integer, AnyRef]()

    def u8(): Int = { val v = b(off) & 0xFF; off += 1; v }
    def i16le(): Int = { val v = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8); off += 2; v }
    def i32le(): Int = {
      val v = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
      off += 4; v
    }
    def i64le(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(off + i).toLong & 0xFF) << (8 * i); i += 1 }
      off += 8; v
    }
    def str(n: Int): String = {
      require(n >= 0 && off + n <= b.length,
        s"corrupt pickle: string length $n at offset $off")
      val s = new String(b, off, n, UTF_8); off += n; s
    }
    def rawBytes(n: Int): Array[Byte] = {
      require(n >= 0 && off + n <= b.length,
        s"corrupt pickle: bytes length $n at offset $off")
      val a = java.util.Arrays.copyOfRange(b, off, off + n); off += n; a
    }
    def line(): String = { // newline-terminated text arg (protocol 0)
      val nl = {
        var i = off
        while (i < b.length && b(i) != '\n') i += 1
        require(i < b.length, s"corrupt pickle: unterminated text arg at $off")
        i
      }
      val s = new String(b, off, nl - off, UTF_8); off = nl + 1; s
    }
    def popToMark(): java.util.ArrayList[AnyRef] = {
      val items = new java.util.ArrayList[AnyRef]()
      while (!stack.isEmpty && (stack.peek ne Mark)) items.add(stack.pop())
      require(!stack.isEmpty, "corrupt pickle: no MARK for collection op")
      stack.pop() // the mark
      java.util.Collections.reverse(items) // popped LIFO; O(n), not add(0,_)
      items
    }
    def setItems(d: AnyRef, items: java.util.List[AnyRef]): Unit = {
      val m = d.asInstanceOf[java.util.LinkedHashMap[AnyRef, AnyRef]]
      require(items.size() % 2 == 0, "corrupt pickle: odd SETITEMS arity")
      var i = 0
      while (i < items.size()) { m.put(items.get(i), items.get(i + 1)); i += 2 }
    }

    var result: AnyRef = null
    var done = false
    while (!done) {
      require(off < b.length, s"corrupt pickle: no STOP before end of input")
      val op = b(off) & 0xFF; off += 1
      op match {
        case 0x80 => u8() match { // PROTO
          case p if p <= 5 => ()
          case p => refuse(s"protocol $p")
        }
        case 0x95 => i64le(); () // FRAME — length hint, ignored
        case '}' => stack.push(new java.util.LinkedHashMap[AnyRef, AnyRef]())
        case ']' | ')' => stack.push(new java.util.ArrayList[AnyRef]())
        case '(' => stack.push(Mark)
        case 'd' => // DICT: mark k1 v1 ... -> dict
          val items = popToMark()
          val m = new java.util.LinkedHashMap[AnyRef, AnyRef]()
          setItems(m, items); stack.push(m)
        case 'l' | 't' => // LIST / TUPLE from mark (tuple-of-scalars tolerated as list)
          stack.push(popToMark())
        case 's' => // SETITEM
          val v = stack.pop(); val k = stack.pop()
          stack.peek.asInstanceOf[java.util.LinkedHashMap[AnyRef, AnyRef]].put(k, v); ()
        case 'u' => // SETITEMS
          val items = popToMark(); setItems(stack.peek, items)
        case 'a' => // APPEND
          val v = stack.pop()
          stack.peek.asInstanceOf[java.util.ArrayList[AnyRef]].add(v); ()
        case 'e' => // APPENDS
          val items = popToMark()
          stack.peek.asInstanceOf[java.util.ArrayList[AnyRef]].addAll(items); ()
        // ---- memo ----------------------------------------------------
        case 0x94 => memo.put(memo.size, stack.peek); () // MEMOIZE
        case 'q' => memo.put(u8(), stack.peek); () // BINPUT
        case 'r' => memo.put(i32le(), stack.peek); () // LONG_BINPUT
        case 'p' => memo.put(line().toInt, stack.peek); () // PUT
        case 'h' => stack.push(memoGet(memo, u8())) // BINGET
        case 'j' => stack.push(memoGet(memo, i32le())) // LONG_BINGET
        case 'g' => stack.push(memoGet(memo, line().toInt)) // GET
        // ---- scalars -------------------------------------------------
        case 0x8c => stack.push(str(u8())) // SHORT_BINUNICODE
        case 'X' => stack.push(str(i32le())) // BINUNICODE
        case 0x8d => // BINUNICODE8
          val n = i64le()
          require(n >= 0 && n <= Int.MaxValue - 8, s"pickle string too large: $n")
          stack.push(str(n.toInt))
        case 'V' => stack.push(line()) // UNICODE (protocol 0)
        case 'K' => stack.push(Long.box(u8().toLong)) // BININT1
        case 'M' => stack.push(Long.box(i16le().toLong)) // BININT2
        case 'J' => stack.push(Long.box(i32le().toLong)) // BININT (signed)
        case 'I' => line() match { // INT (protocol 0; also legacy bools)
          case "01" => stack.push(java.lang.Boolean.TRUE)
          case "00" => stack.push(java.lang.Boolean.FALSE)
          case t => stack.push(Long.box(t.toLong))
        }
        case 'L' => // LONG (protocol 0): decimal text, trailing L
          stack.push(Long.box(line().stripSuffix("L").toLong))
        case 0x8a => stack.push(Long.box(long1(rawBytes(u8())))) // LONG1
        case 0x8b => stack.push(Long.box(long1(rawBytes(i32le())))) // LONG4
        case 'G' => // BINFLOAT: big-endian IEEE double
          var v = 0L; var i = 0
          while (i < 8) { v = (v << 8) | (b(off + i).toLong & 0xFF); i += 1 }
          off += 8
          stack.push(Double.box(java.lang.Double.longBitsToDouble(v)))
        case 'F' => stack.push(Double.box(line().toDouble)) // FLOAT (protocol 0)
        case 0x88 => stack.push(java.lang.Boolean.TRUE) // NEWTRUE
        case 0x89 => stack.push(java.lang.Boolean.FALSE) // NEWFALSE
        case 'N' => stack.push(NullRef) // NONE
        case 'C' => stack.push(rawBytes(u8())) // SHORT_BINBYTES
        case 'B' => stack.push(rawBytes(i32le())) // BINBYTES
        case 0x8e => // BINBYTES8
          val n = i64le()
          require(n >= 0 && n <= Int.MaxValue - 8, s"pickle bytes too large: $n")
          stack.push(rawBytes(n.toInt))
        case '.' => // STOP
          require(!stack.isEmpty, "corrupt pickle: STOP on empty stack")
          result = stack.pop(); done = true
        case other =>
          refuse(f"opcode 0x$other%02x ('${if (other >= 32 && other < 127) other.toChar else '?'}') at offset ${off - 1} — " +
            "only flat-record data opcodes are implemented (no object " +
            "reconstruction: GLOBAL/REDUCE/BUILD and friends are refused)")
      }
    }
    (if (result eq NullRef) null else result, off)
  }

  /** NONE placeholder — ArrayDeque refuses real nulls. */
  private object NullRef

  private def memoGet(memo: java.util.HashMap[Integer, AnyRef],
                      id: Int): AnyRef =
    if (memo.containsKey(id)) memo.get(id)
    else refuse(s"memo reference $id before definition")

  /** Two's-complement little-endian long (CPython LONG1 encoding). */
  private def long1(bs: Array[Byte]): Long = {
    if (bs.isEmpty) return 0L
    require(bs.length <= 8, s"pickle integer wider than 64 bits (${bs.length} bytes)")
    var v = 0L; var i = 0
    while (i < bs.length) { v |= (bs(i).toLong & 0xFF) << (8 * i); i += 1 }
    // sign-extend from the top bit of the most significant byte
    val bits = bs.length * 8
    if (bits < 64 && (v & (1L << (bits - 1))) != 0) v |= -1L << bits
    v
  }

  private def renderDict(m: java.util.LinkedHashMap[_, _]): String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var first = true
    m.forEach { (k, v) =>
      if (!first) sb.append(',')
      first = false
      k match {
        case s: String => Esc.json(sb, s)
        case other => refuse("non-string dict key " +
          (if (other == null) "None" else other.getClass.getSimpleName))
      }
      sb.append(':')
      renderValue(sb, v)
    }
    sb.append('}')
    sb.toString
  }

  private def renderValue(sb: java.lang.StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null"); ()
    case NullRef => sb.append("null"); ()
    case s: String => Esc.json(sb, s)
    case n: java.lang.Long => sb.append(n.longValue()); ()
    case d: java.lang.Double =>
      // JSON proper has no non-finite literals; Spark's reader accepts
      // the Jackson non-numeric tokens (same convention as XlsxLocal)
      sb.append(d.toString); ()
    case b: java.lang.Boolean => sb.append(b.booleanValue()); ()
    case bs: Array[Byte] =>
      Esc.json(sb, java.util.Base64.getEncoder.encodeToString(bs))
    case l: java.util.ArrayList[_] =>
      sb.append('[')
      var first = true
      l.forEach { e =>
        if (!first) sb.append(','); first = false; renderValue(sb, e)
      }
      sb.append(']'); ()
    case m: java.util.LinkedHashMap[_, _] => sb.append(renderDict(m)); ()
    case other => refuse(s"value type ${other.getClass.getSimpleName}")
  }

  // ------------------------------------------------------------------
  // encode: Row -> one protocol-4 pickle per record (PROTO 4, FRAME,
  // dict via MARK..SETITEMS, STOP), concatenated — a CPython-LOADABLE
  // equivalent of per-row pickle.dump(dict, f, protocol=4): CPython
  // interleaves MEMOIZE opcodes this writer deliberately omits (memo
  // is useless across flat scalar records), so bytes are
  // load-compatible, not byte-identical. Any consumer iterating
  // pickle.load()s reads the sink directly (interop-verified).
  // ------------------------------------------------------------------

  import org.apache.spark.sql.types._

  /** Single-stream pickle sink, same documented trade as
    * [[BsonLocal.write]]: a conversion edge (toLocalIterator), not a
    * 100-TB scan path.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 1 << 16)
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val rec = encodeRow(it.next(), schema)
        out.write(rec, 0, rec.length)
      }
    } finally out.close()
  }

  private def encodeRow(row: org.apache.spark.sql.Row,
                        schema: StructType): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream(64)
    body.write('}'); body.write('(')
    var i = 0
    while (i < schema.fields.length) {
      val f = schema.fields(i)
      writeUnicode(body, f.name)
      writeValue(body, if (row.isNullAt(i)) null else row.get(i), f.dataType)
      i += 1
    }
    body.write('u'); body.write('.')
    val out = new java.io.ByteArrayOutputStream(body.size + 11)
    out.write(0x80); out.write(4) // PROTO 4
    out.write(0x95) // FRAME
    val n = body.size.toLong
    var k = 0
    while (k < 8) { out.write(((n >> (8 * k)) & 0xFF).toInt); k += 1 }
    body.writeTo(out)
    out.toByteArray
  }

  private def writeUnicode(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    val u = s.getBytes(UTF_8)
    if (u.length < 256) { o.write(0x8c); o.write(u.length) } // SHORT_BINUNICODE
    else { // BINUNICODE
      o.write('X')
      o.write(u.length & 0xFF); o.write((u.length >> 8) & 0xFF)
      o.write((u.length >> 16) & 0xFF); o.write((u.length >> 24) & 0xFF)
    }
    o.write(u, 0, u.length)
  }

  private def writeLong(o: java.io.ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0 && v < 256) { o.write('K'); o.write(v.toInt) } // BININT1
    else if (v >= Int.MinValue && v <= Int.MaxValue) { // BININT
      o.write('J')
      val i = v.toInt
      o.write(i & 0xFF); o.write((i >> 8) & 0xFF)
      o.write((i >> 16) & 0xFF); o.write((i >> 24) & 0xFF)
    } else { // LONG1, 8 bytes two's-complement LE (64-bit always fits)
      o.write(0x8a); o.write(8)
      var k = 0
      while (k < 8) { o.write(((v >> (8 * k)) & 0xFF).toInt); k += 1 }
    }

  private def writeValue(o: java.io.ByteArrayOutputStream, v: Any,
                         dt: DataType): Unit = {
    if (v == null) { o.write('N'); return }
    dt match {
      case StringType => writeUnicode(o, v.toString)
      case ByteType | ShortType | IntegerType | LongType =>
        writeLong(o, v.asInstanceOf[Number].longValue())
      case FloatType | DoubleType => // BINFLOAT: big-endian IEEE double
        o.write('G')
        val bits = java.lang.Double.doubleToLongBits(
          v.asInstanceOf[Number].doubleValue())
        var k = 7
        while (k >= 0) { o.write(((bits >> (8 * k)) & 0xFF).toInt); k -= 1 }
      case BooleanType =>
        o.write(if (v.asInstanceOf[Boolean]) 0x88 else 0x89)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        if (b.length < 256) { o.write('C'); o.write(b.length) } // SHORT_BINBYTES
        else {
          o.write('B') // BINBYTES
          o.write(b.length & 0xFF); o.write((b.length >> 8) & 0xFF)
          o.write((b.length >> 16) & 0xFF); o.write((b.length >> 24) & 0xFF)
        }
        o.write(b, 0, b.length)
      case _: DecimalType | DateType | TimestampType =>
        // same convention as the BSON sink's date path: ISO/decimal text
        writeUnicode(o, v.toString)
      case ArrayType(elem, _) =>
        o.write(']'); o.write('(')
        v.asInstanceOf[scala.collection.Seq[Any]].foreach(writeValue(o, _, elem))
        o.write('e')
      case st: StructType =>
        o.write('}'); o.write('(')
        val r = v.asInstanceOf[org.apache.spark.sql.Row]
        var i = 0
        while (i < st.fields.length) {
          writeUnicode(o, st.fields(i).name)
          writeValue(o, if (r.isNullAt(i)) null else r.get(i),
            st.fields(i).dataType)
          i += 1
        }
        o.write('u')
      case other =>
        throw new IllegalArgumentException(
          s"pickle sink: unsupported column type $other")
    }
  }

  /** Distributed-per-file pickle read, same shape as [[BsonLocal.read]]:
    * file → one task → JSON lines → Spark inference. A pickle stream is
    * not splittable (like gzip/BSON — no record sync markers), so
    * parallelism is per file; compression envelopes gz/bz2/xz are
    * honored on executors.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val jsonLines = spark.sparkContext
      .binaryFiles(path)
      .flatMap { case (name, stream) =>
        toJsonLines(BsonLocal.maybeDecompress(name, stream.toArray()))
      }
      .toDS()
    spark.read.json(jsonLines)
  }
}
