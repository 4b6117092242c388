package graft.codec

/** Compression for a block's per-row string metadata columns.
  *
  * doc ids: newline-joined + zstd — ids share long prefixes
  * ("source-000000001234"), which zstd's window eats whole.
  * sources: dictionary (partitions are source-pure, so the dict is
  * nearly always a single entry) + varint indexes.
  */
object StringCols {

  def encodeDocIds(ids: Array[String], n: Int): Array[Byte] = {
    // length-prefixed (not delimiter-joined): ids may contain ANY
    // character, including newlines
    val out = new ByteBuf(n * 24)
    var i = 0
    while (i < n) {
      val b = ids(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeVarInt(b.length)
      out.writeBytes(b)
      i += 1
    }
    // same env-tunable level as the payload pass — a hardcoded level
    // here would silently exempt doc-id metadata from the knob
    com.github.luben.zstd.Zstd.compress(out.toArray, BlockCodec.ZstdLevel)
  }

  def decodeDocIds(enc: Array[Byte], n: Int): Array[String] = {
    if (n == 0) return Array.empty
    val size = com.github.luben.zstd.Zstd.getFrameContentSize(enc)
    val raw = com.github.luben.zstd.Zstd.decompress(enc, size.toInt)
    val r = new ByteReader(raw)
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val len = r.readVarInt()
      out(i) = new String(raw, r.pos, len, java.nio.charset.StandardCharsets.UTF_8)
      r.pos += len
      i += 1
    }
    require(r.remaining == 0, s"docIds decode: ${r.remaining} trailing bytes")
    out
  }

  def encodeSources(srcs: Array[String], n: Int): Array[Byte] = {
    val dict = new java.util.LinkedHashMap[String, Integer]()
    val idx = new Array[Int](n)
    var i = 0
    while (i < n) {
      var id = dict.get(srcs(i))
      if (id == null) { id = dict.size; dict.put(srcs(i), id) }
      idx(i) = id
      i += 1
    }
    val out = new ByteBuf(64)
    out.writeVarInt(dict.size)
    val it = dict.keySet().iterator()
    while (it.hasNext) {
      val b = it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeVarInt(b.length)
      out.writeBytes(b)
    }
    // single-source blocks (the common case) need no index bytes
    if (dict.size > 1) {
      i = 0
      while (i < n) { out.writeVarInt(idx(i)); i += 1 }
    }
    out.toArray
  }

  /** If the block is source-PURE (dict collapsed to one entry — the
    * common case, since encode partitions are source-pure by plan),
    * return that source without materializing the per-row array: the
    * leading varint answers purity and the single dict entry follows
    * it. Mixed overflow blocks return None and need [[decodeSources]].
    */
  def pureSource(enc: Array[Byte]): Option[String] = {
    val r = new ByteReader(enc)
    if (r.readVarInt() != 1) return None
    val len = r.readVarInt()
    Some(new String(enc, r.pos, len, java.nio.charset.StandardCharsets.UTF_8))
  }

  def decodeSources(enc: Array[Byte], n: Int): Array[String] = {
    if (n == 0) return Array.empty
    val r = new ByteReader(enc)
    val k = r.readVarInt()
    val dict = new Array[String](k)
    var i = 0
    while (i < k) {
      val len = r.readVarInt()
      dict(i) = new String(enc, r.pos, len, java.nio.charset.StandardCharsets.UTF_8)
      r.pos += len
      i += 1
    }
    val out = new Array[String](n)
    if (k == 1) java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], dict(0))
    else {
      i = 0
      while (i < n) { out(i) = dict(r.readVarInt()); i += 1 }
    }
    out
  }
}
