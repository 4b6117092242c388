package graft.tools

import graft.codec.FloatCodec

/** Pure-JVM float-codec yardstick (no Spark): encodeAuto/decode MB/s
  * and ratio per regime — separates kernel speed from Spark job
  * overhead the same way KernelScaling does for the int codecs.
  */
object FloatBenchCli {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val rng = new scala.util.Random(42)
    val regimes: Seq[(String, Array[Float])] = Seq(
      "gaussian" -> Array.fill(n)(rng.nextGaussian().toFloat),
      "smooth" -> Array.tabulate(n)(i => math.sin(i / 50.0).toFloat),
      "quantized" -> Array.tabulate(n)(i => (i % 7) * 0.25f)
    )
    var allOk = true
    for ((name, vals) <- regimes) {
      // warm-up then best-of-3
      FloatCodec.decode(FloatCodec.encodeAuto(vals, vals.length))
      var encBest = Double.MaxValue
      var decBest = Double.MaxValue
      var enc: Array[Byte] = null
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        enc = FloatCodec.encodeAuto(vals, vals.length)
        encBest = math.min(encBest, (System.nanoTime() - t0) / 1e9)
        val t1 = System.nanoTime()
        val dec = FloatCodec.decode(enc)
        decBest = math.min(decBest, (System.nanoTime() - t1) / 1e9)
        allOk &&= dec.map(java.lang.Float.floatToRawIntBits).toSeq ==
          vals.map(java.lang.Float.floatToRawIntBits).toSeq
      }
      val mb = 4.0 * vals.length / 1048576.0
      println(f"$name%-10s codec=${FloatCodec.names(FloatCodec.codecOf(enc))}%-8s " +
        f"ratio=${4.0 * vals.length / enc.length}%6.3f " +
        f"enc=${mb / encBest}%8.1f MB/s dec=${mb / decBest}%8.1f MB/s")
    }
    println(if (allOk) "ALL-OK" else "ROUNDTRIP-FAIL")
  }
}
