package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** Real image codec over the JDK's ImageIO (headless-capable in this
  * JVM: PNG/JPEG/BMP/GIF/TIFF/WBMP readers and writers ship with
  * Java 17 — no external jars). Synthetic pixels are a deterministic
  * integer function of (id, x, y) so an external oracle can recompute
  * exact pixel checksums of the decoded (lossless PNG) images in SQL.
  */
object ImageCodec {

  final case class DecodedImage(width: Int, height: Int, pixSum: Long,
                                meanByte: Double, lumaHist: Array[Float])

  /** Deterministic RGB pixel: each channel a small affine form mod 256
    * — trivially reproducible in any SQL engine.
    */
  def synthPixel(id: Long, x: Int, y: Int): Int = {
    val r = ((x * 7L + y * 13L + id * 31L) % 256).toInt
    val g = ((x * 11L + y * 3L + id * 17L) % 256).toInt
    val b = ((x * 5L + y * 19L + id * 23L) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  def synthImage(id: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, synthPixel(id, x, y)); x += 1 }
      y += 1
    }
    img
  }

  def synthPng(id: Long, w: Int, h: Int): Array[Byte] =
    encodePng(synthImage(id, w, h))

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, "png", bos)
    require(ok, "no PNG writer available in this JVM")
    bos.toByteArray
  }

  /** Decode any ImageIO-supported format; exact RGB byte sum (the
    * oracle invariant for lossless formats), mean channel byte, and an
    * 8-bin BT.601 integer-luma histogram (L1-normalized).
    */
  def decode(bytes: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    val w = img.getWidth
    val h = img.getHeight
    var pix = 0L
    val hist = new Array[Float](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        pix += r + g + b
        hist(((r * 299 + g * 587 + b * 114) / 1000) / 32) += 1f
        x += 1
      }
      y += 1
    }
    val n = math.max(1, w * h)
    var j = 0
    while (j < 8) { hist(j) /= n.toFloat; j += 1 }
    DecodedImage(w, h, pix, pix.toDouble / (3.0 * n), hist)
  }

  /** Nearest-neighbor resample with the floor mapping
    * `src(x·srcW/dstW, y·srcH/dstH)` — chosen over Graphics2D
    * interpolation because it is integer-exact and therefore
    * SQL-reproducible by the same oracle that checks synthesis.
    */
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = ImageIO.read(new ByteArrayInputStream(bytes))
    require(src != null, "undecodable image bytes")
    val sw = src.getWidth
    val sh = src.getHeight
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * sh / h).toInt
      var x = 0
      while (x < w) {
        dst.setRGB(x, y, src.getRGB((x.toLong * sw / w).toInt, sy) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    encodePng(dst)
  }
}

/** Real audio codec for RIFF/WAVE PCM (the container every audio tool
  * emits; 16-bit mono here). From-scratch chunk walker — same class of
  * effort as the BSON/WARC readers; no external libraries. Synthetic
  * samples are a deterministic integer function of (id, i) so the
  * oracle recomputes exact amplitude sums.
  */
object WavCodec {

  final case class DecodedWav(sampleRate: Int, channels: Int, nSamples: Int,
                              durationMs: Int, ampSum: Long, rms: Double,
                              ampHist: Array[Float])

  /** Deterministic signed 16-bit sample in [-16384, 16383]. */
  def synthSample(id: Long, i: Int): Int =
    ((i.toLong * i * 37L + i.toLong * id * 11L + id * 101L) % 32768L - 16384L).toInt

  /** 16-bit PCM mono RIFF/WAVE file. */
  def synthWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val data = nSamples * 2
    val out = new graft.codec.ByteBuf(44 + data)
    out.writeBytes("RIFF".getBytes("US-ASCII"))
    out.writeIntLE(36 + data)
    out.writeBytes("WAVE".getBytes("US-ASCII"))
    out.writeBytes("fmt ".getBytes("US-ASCII"))
    out.writeIntLE(16)
    def short(v: Int): Unit = { out.writeByte(v & 0xFF); out.writeByte((v >> 8) & 0xFF) }
    short(1) // PCM
    short(1) // mono
    out.writeIntLE(sampleRate)
    out.writeIntLE(sampleRate * 2) // byte rate
    short(2) // block align
    short(16) // bits per sample
    out.writeBytes("data".getBytes("US-ASCII"))
    out.writeIntLE(data)
    var i = 0
    while (i < nSamples) {
      val s = synthSample(id, i)
      out.writeByte(s & 0xFF)
      out.writeByte((s >> 8) & 0xFF)
      i += 1
    }
    out.toArray
  }

  /** Chunk-walking WAV parse (fmt may precede or follow other chunks;
    * odd-sized chunks are word-padded per RIFF). PCM 16-bit only.
    */
  def decode(bytes: Array[Byte]): DecodedWav = {
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE container")
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val cid = new String(bytes, pos, 4, "US-ASCII")
      val r = new graft.codec.ByteReader(bytes, pos + 4)
      val len = r.readIntLE()
      // a hostile/corrupt size field must fail, not stall the walk:
      // len = -8 would otherwise re-read the same chunk forever
      require(len >= 0, s"negative RIFF chunk length $len in '$cid'")
      val body = pos + 8
      cid match {
        case "fmt " =>
          def short(off: Int): Int =
            (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
          val fmt = short(body)
          require(fmt == 1, s"only PCM WAV supported, got format $fmt")
          channels = short(body + 2)
          sampleRate = new graft.codec.ByteReader(bytes, body + 4).readIntLE()
          bits = short(body + 14)
        case "data" =>
          dataOff = body
          dataLen = math.min(len, bytes.length - body)
        case _ => // skip LIST/fact/cue/…
      }
      pos = body + len + (len & 1)
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 16 && channels == 1, "only 16-bit mono supported")
    val n = dataLen / 2
    var ampSum = 0L
    var sq = 0.0
    val hist = new Array[Float](8)
    var i = 0
    while (i < n) {
      val lo = bytes(dataOff + 2 * i) & 0xFF
      val hi = bytes(dataOff + 2 * i + 1).toInt
      val s = (hi << 8) | lo
      val a = math.abs(s)
      ampSum += a
      sq += s.toDouble * s
      hist(math.min(7, a / 2048)) += 1f
      i += 1
    }
    val nn = math.max(1, n)
    var j = 0
    while (j < 8) { hist(j) /= nn.toFloat; j += 1 }
    DecodedWav(sampleRate, channels, n,
      (n.toLong * 1000L / sampleRate).toInt,
      ampSum, math.sqrt(sq / nn), hist)
  }
}
