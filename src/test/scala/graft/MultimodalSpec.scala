package graft

import graft.multimodal.{ImageCodec, Multimodal, WavCodec}

/** Multimodal tests. Round 6: image (JDK ImageIO PNG) and audio
  * (from-scratch RIFF/WAVE PCM) are REAL codecs — pixel/sample
  * exactness is asserted against the deterministic synth formulas and
  * against a hand-built PNG byte stream (external-file interop anchor,
  * ImageIO never saw our encoder for it). Video remains a documented
  * stub. Batching shape, determinism and partition behavior as before.
  */
class MultimodalSpec extends SparkSpecBase {

  test("synth media is deterministic and parallelism-independent") {
    val a = Multimodal.synthMedia(spark, 300, parallelism = 2).collect().sortBy(_.media_id)
    val b = Multimodal.synthMedia(spark, 300, parallelism = 7).collect().sortBy(_.media_id)
    assert(a.length == 300)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id == y.media_id && x.bytes.sameElements(y.bytes))
    }
    assert(a.map(_.kind).distinct.sorted.toSeq == Seq("audio", "image", "video"))
    // images are real PNGs, audio real RIFF/WAVE
    a.filter(_.kind == "image").foreach { m =>
      assert((m.bytes(0) & 0xFF) == 0x89 && m.bytes(1) == 'P' && m.bytes(2) == 'N')
    }
    a.filter(_.kind == "audio").foreach { m =>
      assert(m.bytes(0) == 'R' && m.bytes(1) == 'I' && m.bytes(8) == 'W')
    }
  }

  test("image decode is pixel-exact against the synth formula") {
    val id = 42L
    val (w, h) = (48, 32)
    val d = ImageCodec.decode(ImageCodec.synthPng(id, w, h))
    assert(d.width == w && d.height == h)
    var expect = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ImageCodec.synthPixel(id, x, y)
      expect += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
    }
    assert(d.pixSum == expect)
    assert(math.abs(d.lumaHist.map(_.toDouble).sum - 1.0) < 1e-3)
  }

  test("hand-built PNG byte stream decodes (external interop anchor)") {
    // 2x2 truecolor PNG assembled chunk by chunk: IHDR + deflated
    // scanlines (filter byte 0 per row) + IEND, CRCs by the book.
    // Pixels: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    val raw = Array[Byte](
      0, 255.toByte, 0, 0, 0, 255.toByte, 0,
      0, 0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new Array[Byte](128)
    val compLen = deflater.deflate(comp)
    deflater.end()
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, body: Array[Byte]): Unit = {
      def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      bos.write(be(body.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      bos.write(tb); bos.write(body); bos.write(be(crc.getValue.toInt))
    }
    chunk("IHDR", Array[Byte](0, 0, 0, 2, 0, 0, 0, 2, 8, 2, 0, 0, 0))
    chunk("IDAT", java.util.Arrays.copyOf(comp, compLen))
    chunk("IEND", Array.empty[Byte])
    val d = ImageCodec.decode(bos.toByteArray)
    assert(d.width == 2 && d.height == 2)
    assert(d.pixSum == 255L * 6) // exact channel sum of the 4 pixels
  }

  test("WAV round trip is sample-exact; chunk walker skips foreign chunks") {
    val id = 7L
    val n = 960
    val d = WavCodec.decode(WavCodec.synthWav(id, n, 8000))
    assert(d.sampleRate == 8000 && d.channels == 1 && d.nSamples == n)
    assert(d.durationMs == n * 1000 / 8000)
    val expect = (0 until n).map(i => math.abs(WavCodec.synthSample(id, i)).toLong).sum
    assert(d.ampSum == expect)
    assert(math.abs(d.ampHist.map(_.toDouble).sum - 1.0) < 1e-3)
    // splice an odd-length LIST chunk between WAVE and fmt — RIFF
    // word-padding must carry the walker over it
    val orig = WavCodec.synthWav(id, n, 8000)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(orig, 0, 12)
    bos.write("LIST".getBytes("US-ASCII"))
    bos.write(Array[Byte](3, 0, 0, 0)) // len 3, needs 1 pad byte
    bos.write(Array[Byte](1, 2, 3, 0))
    bos.write(orig, 12, orig.length - 12)
    val d2 = WavCodec.decode(bos.toByteArray)
    assert(d2.ampSum == expect && d2.nSamples == n)
    // hostile negative chunk length must fail loudly, never stall the
    // chunk walk (len = -8 re-reads the same position forever)
    val evil = orig.clone()
    evil(16) = 0xF8.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0xFF.toByte
    intercept[IllegalArgumentException](WavCodec.decode(evil))
  }

  test("decodeFeatures emits one row per input with the declared schema") {
    val ds = Multimodal.synthMedia(spark, 200, parallelism = 3)
    val feats = Multimodal.decodeFeatures(ds, batchSize = 32)
    assert(feats.schema.fieldNames.toSeq == Seq(
      "media_id", "kind", "decoded_w", "decoded_h", "sample_rate",
      "duration_ms", "mean_byte", "exact_sum", "feature", "batch_id",
      "batch_size"))
    val rows = feats.collect()
    assert(rows.length == 200)
    // decoded metadata round-trips the container for every kind
    val byId = rows.map(r => r.media_id -> r).toMap
    ds.collect().foreach { m =>
      assert(byId(m.media_id).decoded_w == m.width)
      assert(byId(m.media_id).decoded_h == m.height)
    }
    // features are L1-normalized histograms
    rows.foreach { r =>
      assert(math.abs(r.feature.map(_.toDouble).sum - 1.0) < 1e-3)
    }
    // audio rows carry real sample metadata
    rows.filter(_.kind == "audio").foreach { r =>
      assert(r.sample_rate == 8000 && r.duration_ms == r.decoded_w * 1000 / 8000)
    }
  }

  test("batch shape: full batches of batchSize, bounded remainder per partition") {
    val ds = Multimodal.synthMedia(spark, 200, parallelism = 4).repartition(4)
    val rows = Multimodal.decodeFeatures(ds, batchSize = 16).collect()
    val sizes = rows.map(_.batch_size)
    assert(sizes.max <= 16)
    assert(rows.count(_.batch_size == 16) >= 150)
  }

  test("resize really resamples images (nearest-neighbor, integer-exact)") {
    val ds = Multimodal.synthMedia(spark, 60, parallelism = 2)
    val resized = Multimodal.resize(ds, 64, 48)
    val feats = Multimodal.decodeFeatures(resized).collect()
    feats.filter(_.kind == "image").foreach { f =>
      assert(f.decoded_w == 64 && f.decoded_h == 48)
    }
    // pixel-exact NN: dst(x,y) = synthPixel(id, x*sw/64, y*sh/48)
    val m0 = ds.collect().filter(_.kind == "image").minBy(_.media_id)
    val exp = (for (y <- 0 until 48; x <- 0 until 64) yield {
      val rgb = ImageCodec.synthPixel(m0.media_id,
        x * m0.width / 64, y * m0.height / 48)
      (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)).toLong
    }).sum
    val got = feats.filter(_.media_id == m0.media_id).head
    assert(got.exact_sum == exp)
    // audio passes through; video stub rewrites its header
    feats.filter(_.kind == "audio").foreach(f => assert(f.sample_rate == 8000))
    feats.filter(_.kind == "video").foreach { f =>
      assert(f.decoded_w == 64 && f.decoded_h == 48)
    }
  }

  test("frameSample yields k frames per video row only") {
    val ds = Multimodal.synthMedia(spark, 90, parallelism = 2)
    val frames = Multimodal.frameSample(ds, 4).collect()
    val videos = ds.filter(_.kind == "video").count()
    assert(frames.length == videos * 4)
    assert(frames.forall(_.frame_bytes.length <= 16))
    assert(frames.map(_.frame_idx).distinct.sorted.toSeq == Seq(0, 1, 2, 3))
  }
}
