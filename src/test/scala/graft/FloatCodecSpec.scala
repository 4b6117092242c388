package graft

import org.apache.spark.sql.functions._
import graft.codec.FloatCodec
import graft.encode.VectorBlocks

/** Lossless float32 compression: bit-exact round trips per kernel and
  * through auto-selection (incl. NaN payloads / -0.0f / denormals),
  * size wins in the regimes each kernel exists for, and the block
  * transform's (id, vector) round trip.
  */
class FloatCodecSpec extends SparkSpecBase {

  private def bits(a: Array[Float]): Seq[Int] =
    a.map(java.lang.Float.floatToRawIntBits).toSeq

  private val regimes: Seq[(String, Array[Float])] = {
    val rng = new scala.util.Random(42)
    Seq(
      "gaussian" -> Array.fill(5000)(rng.nextGaussian().toFloat),
      "uniform01" -> Array.fill(5000)(rng.nextFloat()),
      "smooth" -> Array.tabulate(5000)(i => math.sin(i / 50.0).toFloat),
      "constant" -> Array.fill(5000)(3.14159f),
      "quantized" -> Array.tabulate(5000)(i => (i % 7) * 0.25f),
      "specials" -> Array.tabulate(512)(i => i % 8 match {
        case 0 => Float.NaN
        case 1 => java.lang.Float.intBitsToFloat(0x7fc00001) // NaN payload
        case 2 => java.lang.Float.intBitsToFloat(0xffc12345) // negative NaN
        case 3 => Float.PositiveInfinity
        case 4 => Float.NegativeInfinity
        case 5 => -0.0f
        case 6 => java.lang.Float.MIN_VALUE // denormal
        case _ => 1e-40f                    // denormal
      }),
      "single" -> Array(-123.456f),
      "empty" -> Array.emptyFloatArray
    )
  }

  test("every kernel round-trips BIT-exactly on every regime") {
    for ((name, vals) <- regimes;
         cid <- Seq(FloatCodec.Plain, FloatCodec.Shuffle, FloatCodec.Xor);
         zstd <- Seq(true, false)) {
      val enc = FloatCodec.encodeAs(cid, vals, vals.length, zstd)
      val dec = FloatCodec.decode(enc)
      assert(bits(dec) == bits(vals),
        s"$name/${FloatCodec.names(cid)} zstd=$zstd round trip")
    }
  }

  test("auto-selection round-trips and picks a sane kernel per regime") {
    for ((name, vals) <- regimes) {
      val enc = FloatCodec.encodeAuto(vals, vals.length)
      assert(bits(FloatCodec.decode(enc)) == bits(vals), s"$name auto round trip")
    }
    // smooth/constant/quantized: XOR must beat raw by a wide margin
    for (name <- Seq("constant", "quantized")) {
      val vals = regimes.toMap.apply(name)
      val enc = FloatCodec.encodeAuto(vals, vals.length)
      assert(enc.length < vals.length, s"$name: ${enc.length}B for ${4 * vals.length}B raw")
    }
    // gaussian noise: byte-plane shuffle must still beat raw parquet-
    // style plain+zstd (sign/exponent planes cluster)
    val g = regimes.toMap.apply("gaussian")
    val auto = FloatCodec.encodeAuto(g, g.length).length
    val plainZ = FloatCodec.encodeAs(FloatCodec.Plain, g, g.length).length
    assert(auto <= plainZ, s"auto $auto should be <= plain+zstd $plainZ")
    assert(auto < 4 * g.length, "must beat raw on gaussian")
  }

  test("XOR control stream handles window widen/narrow/reuse sequences") {
    // engineered to exercise: identical (xor=0), reuse window, new
    // wider window, new narrower window, full-width flip
    val vals = Array(1.0f, 1.0f, 1.0000001f, 1.0000002f, -1.0f, 0.0f,
      -0.0f, Float.NaN, 1.0f, 1.5f, 1.25f, 1.125f)
    for (cid <- Seq(FloatCodec.Xor)) {
      val enc = FloatCodec.encodeAs(cid, vals, vals.length, zstd = false)
      assert(bits(FloatCodec.decode(enc)) == bits(vals))
    }
  }

  test("VectorBlocks: (id, vector) round trip incl. ragged dims and empty vecs") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 500L).map { id =>
      val dim = (id % 5) match {
        case 0 => 0 // empty vector
        case 1 => 3
        case _ => 16
      }
      (id, Array.fill(dim)(rng.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding").repartition(7)
    val blocks = VectorBlocks.encode(df, "embedding", "vec_id", rowsPerBlock = 64)
    val back = VectorBlocks.decode(blocks)
    assert(back.count() == 500L)
    val a = df.selectExpr("vec_id", "embedding")
    val bad = a.exceptAll(back).count() + back.exceptAll(a).count()
    assert(bad == 0L)
    // blocks are bounded and self-describing
    val mb = blocks.agg(max("n_rows")).collect()(0).getInt(0)
    assert(mb <= 64)
  }

  test("VectorBlocks on the driver embeddings table: bit-exact, smaller than raw") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val blocks = VectorBlocks.encode(emb, "embedding", "vec_id").cache()
    val back = VectorBlocks.decode(blocks)
    val bad = emb.exceptAll(back).count() + back.exceptAll(emb).count()
    assert(bad == 0L)
    val Seq(raw, enc) = blocks.agg(sum("raw_bytes"), sum("enc_bytes"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    assert(enc < raw, s"encoded $enc !< raw $raw")
    blocks.unpersist()
  }
}
