package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus batched
  * decode / feature-extract / resize / frame-sample transforms.
  *
  * The Spark-side plumbing (schema, partitioning, batched iteration
  * shape — the Scala analog of `mapInPandas` batch processing) is
  * real and tested. The codec step itself is a STUB: no image/audio
  * libraries ship in this environment, so `StubCodec` parses a
  * deterministic fake container format. Swapping in a real decoder
  * means replacing StubCodec only — every signature stays.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Int)
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, kind: String,
                                 decoded_w: Int, decoded_h: Int,
                                 mean_byte: Double, feature: Array[Float],
                                 batch_id: Int, batch_size: Int)
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** ======== STUB CODEC ========
    * Fake container: "GRFT" magic, kind byte, width/height int32 LE,
    * then payload bytes. A real implementation would call an image /
    * audio / video library here — deliberately ??? -free but FAKE.
    */
  object StubCodec {
    val Magic: Array[Byte] = "GRFT".getBytes("UTF-8")

    def encodeFake(id: Long, kind: String, w: Int, h: Int): Array[Byte] = {
      val payloadLen = 64 + (id % 192).toInt
      val out = new graft.codec.ByteBuf(16 + payloadLen)
      out.writeBytes(Magic)
      out.writeByte(kind.headOption.getOrElse('i').toInt)
      out.writeIntLE(w)
      out.writeIntLE(h)
      var i = 0
      var s = id * 0x9E3779B97F4A7C15L + 1
      while (i < payloadLen) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out.writeByte(((s >>> 33) & 0xFF).toInt)
        i += 1
      }
      out.toArray
    }

    /** STUB decode: parse the fake header + payload mean. */
    def decode(bytes: Array[Byte]): (Int, Int, Double, Array[Float]) = {
      require(bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'R',
        "not a GRFT container")
      val r = new graft.codec.ByteReader(bytes, 5)
      val w = r.readIntLE()
      val h = r.readIntLE()
      var sum = 0L
      var i = 13
      while (i < bytes.length) { sum += (bytes(i) & 0xFF); i += 1 }
      val n = math.max(1, bytes.length - 13)
      val mean = sum.toDouble / n
      // fake 8-dim "embedding": byte histogram octants, L1-normalized
      val hist = new Array[Float](8)
      i = 13
      while (i < bytes.length) { hist((bytes(i) & 0xFF) / 32) += 1f; i += 1 }
      (0 until 8).foreach(j => hist(j) /= n.toFloat)
      (w, h, mean, hist)
    }
  }

  /** Deterministic synthetic media table (parallelism-independent). */
  def synthMedia(spark: SparkSession, n: Long, parallelism: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val p = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, p).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val w = 32 + (id % 8).toInt * 16
      val h = 32 + (id % 5).toInt * 16
      MediaRow(id, kind, StubCodec.encodeFake(id, kind, w, h), w, h)
    }
  }

  /** Batched decode + feature extraction: the mapInPandas-shaped
    * partition iterator — pull `batchSize` rows, process the batch as
    * one unit (a real decoder amortizes model/codec init per batch),
    * emit one output row per input. batch_id/batch_size are surfaced
    * so tests can assert the batch shape.
    */
  def decodeFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      var batchId = 0
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch init would live here (codec contexts, model state)
        val out = batch.map { r =>
          val (w, h, mean, feat) = StubCodec.decode(r.bytes)
          MediaFeatures(r.media_id, r.kind, w, h, mean, feat, batchId, batch.size)
        }
        batchId += 1
        out
      }
    }
  }

  /** Resize stub: rewrites the container header to the target size
    * (a real impl would resample pixels); metadata stays consistent.
    */
  def resize(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { r =>
      val payload = java.util.Arrays.copyOfRange(r.bytes, 13, r.bytes.length)
      val out = new graft.codec.ByteBuf(13 + payload.length)
      out.writeBytes(StubCodec.Magic)
      out.writeByte(r.kind.headOption.getOrElse('i').toInt)
      out.writeIntLE(w)
      out.writeIntLE(h)
      out.writeBytes(payload)
      MediaRow(r.media_id, r.kind, out.toArray, w, h)
    }
  }

  /** Frame sampling stub for video rows: k deterministic offsets into
    * the payload become "frames" (a real impl decodes k frames).
    */
  def frameSample(ds: Dataset[MediaRow], k: Int): Dataset[Frame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").flatMap { r =>
      val payload = java.util.Arrays.copyOfRange(r.bytes, 13, r.bytes.length)
      val step = math.max(1, payload.length / math.max(1, k))
      (0 until math.min(k, payload.length)).map { f =>
        val off = f * step
        Frame(r.media_id, f,
          java.util.Arrays.copyOfRange(payload, off, math.min(off + 16, payload.length)))
      }
    }
  }
}
