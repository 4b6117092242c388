package graft

import org.apache.spark.sql.functions._
import graft.codec.DocBloom
import graft.encode.{TokenDecoder, TokenEncoder}

/** Per-block doc-id Bloom filters + the point-lookup reader: kernel
  * contract (no false negatives, bounded false positives), store-level
  * equality vs a raw filter, legacy stores (no bloom column) staying
  * exact, and the pruning effect the filter exists for.
  */
class DocBloomSpec extends SparkSpecBase {

  test("kernel: no false negatives; false positives bounded; legacy null answers true") {
    val present = Array.tabulate(20000)(i => f"src-$i%012d")
    val enc = DocBloom.build(present, present.length)
    assert(present.forall(DocBloom.mayContain(enc, _)), "false negative")
    val absent = Array.tabulate(20000)(i => f"other-$i%012d")
    val fp = absent.count(DocBloom.mayContain(enc, _))
    assert(fp < 1000, s"fp rate ${fp / 20000.0} >= 5%")
    assert(DocBloom.mayContain(null, "anything"))
    assert(DocBloom.mayContain(Array.emptyByteArray, "anything"))
    // empty block: a tiny filter that rejects everything it never saw
    val empty = DocBloom.build(Array.empty[String], 0)
    assert(!DocBloom.mayContain(empty, "src-000000000001"))
  }

  test("readDocsById: exact rows back, blooms prune most blocks") {
    import spark.implicits._
    val ds = graft.synth.TokenSynth.dataset(spark, 2000)
    val dir = tmpDir("graft-docbloom")
    TokenEncoder.run(ds, dir, TokenEncoder.EncodeConfig(targetRowsPerPart = 100))

    val all = ds.collect()
    val wanted = all.map(_.doc_id).sorted.take(5).toSeq
    val got = TokenDecoder.readDocsById(spark, dir, wanted)
      .collect().map(r => (r.doc_id, r.tokens.toSeq, r.n_tok, r.source)).sortBy(_._1)
    val want = all.filter(r => wanted.contains(r.doc_id))
      .map(r => (r.doc_id, r.tokens.toSeq, r.n_tok, r.source)).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // a missing id returns nothing (and trips no error)
    assert(TokenDecoder.readDocsById(spark, dir, Seq("nope-000")).isEmpty)

    // the mechanism: most committed blocks reject each single id from
    // metadata alone — that is the read the two-phase lookup never does
    val blooms = spark.read.parquet(s"$dir/blocks")
      .select("docBloomEnc").as[Array[Byte]].collect()
    assert(blooms.length > 5, s"want several blocks, got ${blooms.length}")
    val mayContain = blooms.count(DocBloom.mayContain(_, wanted.head))
    assert(mayContain.toDouble / blooms.length < 0.5,
      s"bloom rejected too little: $mayContain/${blooms.length}")
  }

  test("legacy store without the bloom column: unpruned but exact") {
    import spark.implicits._
    val ds = graft.synth.TokenSynth.dataset(spark, 300)
    val dir = tmpDir("graft-docbloom-legacy")
    TokenEncoder.run(ds, dir, TokenEncoder.EncodeConfig(targetRowsPerPart = 150))
    // strip the column, emulating a store written before it existed
    val stripped = spark.read.parquet(s"$dir/blocks").drop("docBloomEnc")
    val tmp = tmpDir("graft-docbloom-legacy-blocks")
    stripped.write.mode("overwrite")
      .option("compression", "uncompressed").parquet(tmp)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$dir/blocks"))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(s"$dir/blocks"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)

    val all = ds.collect()
    val wanted = all.map(_.doc_id).sorted.take(3).toSeq
    val got = TokenDecoder.readDocsById(spark, dir, wanted)
      .collect().map(r => (r.doc_id, r.tokens.toSeq)).sortBy(_._1)
    val want = all.filter(r => wanted.contains(r.doc_id))
      .map(r => (r.doc_id, r.tokens.toSeq)).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // and the full decode path still round-trips the legacy store
    val back = TokenDecoder.read(spark, dir)
    assert(ds.toDF().exceptAll(back.toDF()).count() == 0L &&
      back.toDF().exceptAll(ds.toDF()).count() == 0L)
  }
}
