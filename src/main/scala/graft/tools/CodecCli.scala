package graft.tools

import graft.codec._

/** Tiny CLI over the codec kernels: encodes deterministic sample
  * regimes (FIXTURES.md §C) and reports codec choice / ratio /
  * round-trip. Serves as the library's runnable demo surface:
  *   sbt "runMain graft.tools.CodecCli"
  */
object CodecCli {
  def main(args: Array[String]): Unit = {
    val rng = new scala.util.Random(7)
    var failed = false
    def show(name: String, data: Array[Int]): Unit = {
      val be = BlockCodec.encodeAuto(data, data.length)
      val back = BlockCodec.decode(be.codecId, be.postCodec, be.symtab, be.payload, data.length)
      val ok = back.sameElements(data)
      if (!ok) failed = true
      val ratio =
        if (data.length == 0) 1.0 else (4.0 * data.length) / math.max(1, be.encodedBytes)
      println(f"$name%-14s codec=${CodecIds.names(be.codecId)}%-8s zstd=${be.postCodec} " +
        f"raw=${4L * data.length}%9d enc=${be.encodedBytes}%9d ratio=$ratio%7.2fx roundtrip=$ok")
    }
    show("runs", Array.fill(50)(rng.nextInt(20)).flatMap(v => Array.fill(1000)(v)))
    show("smallValues", Array.fill(100000)(rng.nextInt(256)))
    show("narrowRange", Array.fill(100000)((1 << 28) + rng.nextInt(1024)))
    val phrases = Array.fill(30)(Array.fill(3 + rng.nextInt(6))(rng.nextInt(30000)))
    show("phrases", Array.fill(20000)(phrases(rng.nextInt(30))).flatten)
    show("lowCard", { val v = Array.fill(100)(rng.nextInt(1 << 20)); Array.fill(100000)(v(rng.nextInt(100))) })
    show("random", Array.fill(100000)(rng.nextInt(Int.MaxValue)))
    show("sortedIds", Array.tabulate(100000)(i => i * 3 + rng.nextInt(3)))
    show("empty", Array.emptyIntArray)
    show("single", Array(42))
    show("negatives", Array.fill(10000)(rng.nextInt()))
    show("intmax", Array.fill(100)(Int.MaxValue) ++ Array(Int.MinValue, 0, -1))
    show("escape-heavy", Array.fill(50000)(if (rng.nextBoolean()) 0x7F else 0xFF))
    if (failed) { println("ROUNDTRIP-FAILURES"); sys.exit(1) }
    println("ALL-OK")
  }
}
