package graft

import graft.encode.{TokenEncoder, TokenIndex}

/** TokenIndex broadcast-gate sizing (VERDICT r6 #2): the 256 MB gate
  * must measure through the Hadoop FileSystem API so it holds on any
  * store filesystem, and an UNMEASURABLE path must degrade to
  * no-pruning — never to an ungated broadcast.
  */
class TokenIndexSpec extends SparkSpecBase {

  test("indexBytes measures a real index and abstains on a bad scheme") {
    val ds = graft.synth.TokenSynth.dataset(spark, 200)
    val dir = tmpDir("graft-tokidx-gate")
    TokenEncoder.run(ds, dir, TokenEncoder.EncodeConfig(targetRowsPerPart = 100))
    TokenIndex.build(spark, dir)
    val measured = TokenIndex.indexBytes(spark, dir)
    assert(measured > 0L && measured < TokenIndex.MaxBroadcastBytes,
      s"real index should measure small, got $measured")
    // a path-style/filesystem miss answers Long.MaxValue => the gate
    // REFUSES the broadcast (no pruning), it never trivially passes
    val unmeasurable = TokenIndex.indexBytes(spark, "nosuchfs://bucket/store")
    assert(unmeasurable == Long.MaxValue)
    assert(unmeasurable > TokenIndex.MaxBroadcastBytes)
    // a store with no index at all reads as 0 (gate passes, load()
    // returns None anyway => no pruning, no broadcast)
    assert(TokenIndex.indexBytes(spark, tmpDir("graft-tokidx-none")) == 0L)
  }

  test("corrupt bloom rows abstain instead of failing the scan") {
    import graft.codec.TokBloom
    // truncated varint (continuation bit set, no payload)
    assert(TokBloom.mayContain(Array[Byte](0x80.toByte), 42))
    // m not a power of two
    val bad = graft.codec.TokBloom.build(Array(1, 2, 3), 3)
    bad(0) = 0x03 // mangle the m varint
    assert(TokBloom.mayContain(bad, 42))
    // truncated payload: declared m larger than remaining bytes
    val b2 = graft.codec.TokBloom.build(Array(1, 2, 3), 3)
    assert(TokBloom.mayContain(java.util.Arrays.copyOf(b2, 2), 42))
    // intact filter still rejects absent keys (no behavior change)
    val ok = graft.codec.TokBloom.build(Array.tabulate(64)(_ * 3), 64)
    assert(TokBloom.mayContain(ok, 9))
    assert(!(0 until 1000).forall(t => TokBloom.mayContain(ok, t * 3 + 1)))
  }
}
