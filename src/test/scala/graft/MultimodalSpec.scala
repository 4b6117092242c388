package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing tests: the STUBBED codec is fake by design; the
  * schema, batching shape, determinism, and partition behavior are the
  * real thing under test.
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
  }

  test("decodeFeatures emits one row per input with the declared schema") {
    val ds = Multimodal.synthMedia(spark, 200, parallelism = 3)
    val feats = Multimodal.decodeFeatures(ds, batchSize = 32)
    assert(feats.schema.fieldNames.toSeq == Seq(
      "media_id", "kind", "decoded_w", "decoded_h", "mean_byte",
      "feature", "batch_id", "batch_size"))
    val rows = feats.collect()
    assert(rows.length == 200)
    // decoded metadata round-trips the container header
    val byId = rows.map(r => r.media_id -> r).toMap
    ds.collect().foreach { m =>
      assert(byId(m.media_id).decoded_w == m.width)
      assert(byId(m.media_id).decoded_h == m.height)
    }
    // features are L1-normalized histograms
    rows.foreach { r =>
      assert(math.abs(r.feature.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("batch shape: full batches of batchSize, bounded remainder per partition") {
    val ds = Multimodal.synthMedia(spark, 200, parallelism = 4).repartition(4)
    val rows = Multimodal.decodeFeatures(ds, batchSize = 16).collect()
    val sizes = rows.map(_.batch_size)
    assert(sizes.max <= 16)
    // every row carries its batch size; full batches dominate
    assert(rows.count(_.batch_size == 16) >= 150)
  }

  test("resize rewrites metadata consistently and decode sees it") {
    val ds = Multimodal.synthMedia(spark, 50, parallelism = 2)
    val resized = Multimodal.resize(ds, 224, 224)
    val feats = Multimodal.decodeFeatures(resized).collect()
    assert(feats.forall(f => f.decoded_w == 224 && f.decoded_h == 224))
    // payload (and so features) unchanged by resize stub
    val before = Multimodal.decodeFeatures(ds).collect()
      .map(f => f.media_id -> f.mean_byte).toMap
    feats.foreach(f => assert(f.mean_byte == before(f.media_id)))
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
