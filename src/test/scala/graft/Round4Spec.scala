package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Round-4 regressions. The bench-JSON tests exist because round 3's
  * bench signal was LOST: the single-line JSON with 71 per-query
  * timings outgrew the driver's 2000-char stdout tail capture and the
  * driver recorded `parsed: null`. The stdout line is now a compact
  * summary with a hard length guarantee; the full per-query map lives
  * in a sibling file.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // worst case: a full-size query surface with long names, large
  // timing values, several failures, and max-width encode numbers
  private val manyQueries = (1 to 120).map(i =>
    f"q_long_descriptive_query_name_$i%03d" -> 12345.678)
  private val failures = Seq("q_failed_one", "q_failed_two", "q_failed_three")
  private val encodeJson =
    """{"rows":600000,"tokens":119987654,"cpus_lo":8,"cpus_hi":32,""" +
    """"tokens_per_sec_lo":27654321,"tokens_per_sec_hi":42876543,"reps":2,""" +
    """"inversion_retries":2,"inversion_unresolved":false,""" +
    """"pair_scaling_efficiency_best":0.388,""" +
    """"decode_retries":1,"scaling_efficiency":0.388,""" +
    """"tokens_per_sec_c2":9876543,"tokens_per_sec_c8":24765432,""" +
    """"scaling_efficiency_2_8":0.627,"noshuffle_tokens_per_sec_lo":33456789,""" +
    """"noshuffle_tokens_per_sec_hi":44765432,"kernel_tokens_per_sec_1":12345678,""" +
    """"kernel_tokens_per_sec_8":76543210,"kernel_scaling_1_8":0.775,""" +
    """"decode_tokens_per_sec":130456789,"decode_tokens_per_sec_lo":98765432,""" +
    """"decode_scaling_efficiency":0.330,"ann_recall_lsh":0.938,""" +
    """"ann_scanned_lsh":0.038,"ann_recall_ivf":0.972,""" +
    """"ann_scanned_ivf":0.125,"ann_queries":32,"ann_k":10,""" +
    """"vector_compression_ratio":1.234,"vector_encode_mb_per_sec":1234,""" +
    """"vector_kernel_mb_per_sec":1234,""" +
    """"compression_ratio":5.080}"""
  private val sfDir = "/root/testdata/sf0.1"
  private val qFile = "/root/repo/BENCH_QUERIES.json"

  test("bench summary line fits the driver's stdout tail capture") {
    val line = Bench.renderSummary(98765.432, manyQueries, failures,
      sfDir, qFile, encodeJson)
    assert(!line.contains("\n"))
    assert(line.length <= 1800,
      s"summary line is ${line.length} chars — would fall outside the " +
      "driver's 2000-char tail capture")
  }

  test("bench summary line is valid JSON with the driver-contract keys") {
    val line = Bench.renderSummary(98765.432, manyQueries, failures,
      sfDir, qFile, encodeJson)
    val root = mapper.readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("unit").asText() == "sec")
    assert(root.get("value").asDouble() > 0)
    assert(root.get("queries").isObject)
    assert(root.get("queries").size() <= 8)
    assert(root.get("queries_count").asInt() == manyQueries.size)
    assert(root.get("queries_file").asText() == qFile)
    assert(root.get("queries_failed").size() == failures.size)
    assert(root.get("encode").get("compression_ratio").asDouble() == 5.080)
    assert(root.get("encode").get("ann_recall_lsh").asDouble() == 0.938)
  }

  test("bench summary headline subset is the slowest queries") {
    val times = Seq("q_fast" -> 0.1, "q_slow" -> 9.0, "q_mid" -> 1.0)
    val line = Bench.renderSummary(10.1, times, Nil, sfDir, qFile, encodeJson)
    val qs = mapper.readTree(line).get("queries")
    val names = qs.fieldNames()
    assert(names.next() == "q_slow")
  }

  test("bench summary shrinks headline under a tighter budget instead of overflowing") {
    // 1110 sits just above the zero-query floor (the encode record is
    // not shrinkable — it IS the driver contract), so this asserts the
    // headline subset actually EMPTIES before the line overflows; if
    // the encode record grows past the budget, fail here consciously
    val line = Bench.renderSummary(98765.432, manyQueries, failures,
      sfDir, qFile, encodeJson, maxLen = 1110)
    assert(line.length <= 1110)
    assert(mapper.readTree(line).get("queries").size() == 0,
      "expected the headline subset to shrink to empty at this budget")
    assert(mapper.readTree(line).get("queries_count").asInt() == manyQueries.size)
  }

  test("bench full record carries every query and escapes JSON strings") {
    val full = Bench.renderFull(12.3,
      Seq("q_a" -> 1.0, "q_b\"quote" -> 2.0), Seq("q_c\\back"),
      "/tmp/sf \"x\"", encodeJson)
    val root = mapper.readTree(full)
    assert(root.get("queries").size() == 2)
    assert(root.get("queries").get("q_b\"quote").asDouble() == 2.0)
    assert(root.get("queries_failed").get(0).asText() == "q_c\\back")
    assert(root.get("sf").asText() == "/tmp/sf \"x\"")
  }
}

/** connectedComponents regressions: the round-3 convergence test
  * summed labels cast to decimal(38,0), which reads every STRING id
  * as NULL — the sum was zero each sweep and the loop declared
  * convergence after ONE sweep, silently returning under-propagated
  * clusters for any string-id component with diameter > 1.
  */
class ConnectedComponentsSpec extends SparkSpecBase {
  import graft.dedup.Dedup

  private def chainPairs = {
    val s = spark
    import s.implicits._
    // a-b-c-d: diameter 3, needs 2+ sweeps — one sweep leaves
    // c->b, d->c instead of the correct all->a
    Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("id_a", "id_b")
  }

  test("connectedComponents propagates fully over STRING ids (diameter > 1)") {
    val cc = Dedup.connectedComponents(chainPairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  test("connectedComponents refuses non-convergence for string ids too") {
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chainPairs, maxIter = 1,
        smallGraphCap = 0).collect()
    }
  }

  test("alternating-star CC equals label propagation on random graphs") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rng = new scala.util.Random(seed)
      val pairs = Seq.fill(120)((rng.nextInt(150).toLong, rng.nextInt(150).toLong))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val plain = Dedup.connectedComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val star = Dedup.connectedComponentsStar(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(star == plain, s"seed $seed")
    }
  }

  test("alternating-star CC handles a hot vertex and string ids") {
    val s = spark
    import s.implicits._
    // one hub paired with everyone (the skew shape that motivates the
    // star form) plus a separate chain
    val hub = (1 to 200).map(i => ("hub", f"doc_$i%03d"))
    val chain = Seq(("x1", "x2"), ("x2", "x3"), ("x3", "x4"))
    val pairs = (hub ++ chain).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(cc("hub") == "doc_001" && cc("doc_200") == "doc_001")
    assert(cc("x1") == "x1" && cc("x4") == "x1")
    val plain = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(cc == plain)
  }

  test("alternating-star CC refuses under maxIter, empty pairs are empty") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Dedup.connectedComponentsStar(
        Seq(("a", "b")).toDF("id_a", "id_b"), maxIter = 0).collect()
    }
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponentsStar(none).count() == 0)
  }

  test("reliable-checkpoint CC equals the localCheckpoint default") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    // random graph over 200 vertices: several multi-hop components
    val pairs = Seq.fill(150)((rng.nextInt(200).toLong, rng.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val dir = tmpDir("graft-cc-ckpt")
    // smallGraphCap = 0: this test exercises the ITERATIVE arm's
    // checkpoint plumbing, which the exact small-graph solve skips
    val local = Dedup.connectedComponents(pairs, smallGraphCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = Dedup.connectedComponents(pairs, checkpointDir = Some(dir),
        smallGraphCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == local)
    // and the exact small-graph solve (default cap) matches both
    val fast = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == local)
    // the reliable path actually wrote checkpoint files
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }
}

/** Measured ANN recall@10 at the DEFAULT settings Bench reports.
  *
  * Planted near-dup structure (each query's true neighbors at cosine
  * ~0.999 — the regime the pipeline uses ANN for) must give >= 0.9
  * recall. On isotropic random vectors no sublinear index can do
  * well (mean true-neighbor cosine ~0.35 => sign-LSH same-bucket
  * probability ~0.61^nPlanes); there the honest claim is
  * CONCENTRATION — recall strictly above the scanned fraction, which
  * is exactly the recall a random subset of the same size would get.
  */
class AnnRecallSpec extends SparkSpecBase {
  import graft.sim.{Ivf, Recall, Similarity}
  import org.apache.spark.sql.functions._

  private val dim = 64

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def randVec(rng: scala.util.Random): Array[Float] =
    unit(Array.fill(dim)(rng.nextGaussian().toFloat))

  test("ANN recall@10 >= 0.9 at default settings on planted near-dup clusters") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(42)
    val bases = (0 until 60).map(_ => randVec(rng))
    val rows = for {
      b <- bases.indices
      c <- 0 until 10
    } yield {
      val noisy = bases(b).map(x => x + (rng.nextGaussian() * 0.02).toFloat)
      ((b * 10 + c).toLong, unit(noisy).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .cache()
    val queries = bases.take(24).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val truth = Recall.truthAtK(corpus, "embedding", "vec_id", queries, 10)

    val lshGot = queries.map { case (qid, qv) =>
      qid -> Similarity.annTopK(corpus, "embedding", "vec_id", qv, 10)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    }.toMap
    val lshRecall = Recall.recallOf(truth, lshGot)
    assert(lshRecall >= 0.9, s"LSH recall@10 = $lshRecall at defaults")

    val idx = Ivf.train(corpus, "embedding")
    val assigned = Ivf.assign(corpus, "embedding", idx).cache()
    val ivfGot = Ivf.searchBatch(assigned, "embedding", "vec_id", idx, queries, 10)
      .select(col("qid"), col("vec_id").cast("long").as("id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val ivfRecall = Recall.recallOf(truth, ivfGot)
    assert(ivfRecall >= 0.9, s"IVF recall@10 = $ivfRecall at defaults")
    assigned.unpersist(); corpus.unpersist()
  }

  test("multi-probe radius trades scan fraction for recall monotonically") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map(i => (i.toLong, randVec(rng).toSeq))
    val corpus = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .cache()
    val queries = rows.take(12).map { case (i, v) => (i, v.toArray) }
    val truth = Recall.truthAtK(corpus, "embedding", "vec_id", queries, 10)
    val nPlanes = 6
    val recalls = (0 to 2).map { radius =>
      val got = queries.map { case (qid, qv) =>
        qid -> Similarity.annTopK(corpus, "embedding", "vec_id", qv, 10,
            nPlanes = nPlanes, probeRadius = radius)
          .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
      }.toMap
      Recall.recallOf(truth, got)
    }
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2),
      s"recall must grow with radius: $recalls")
    // radius = nPlanes probes every bucket => identical to brute force
    val full = queries.map { case (qid, qv) =>
      qid -> Similarity.annTopK(corpus, "embedding", "vec_id", qv, 10,
          nPlanes = nPlanes, probeRadius = nPlanes)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    }.toMap
    assert(Recall.recallOf(truth, full) == 1.0)
    corpus.unpersist()
  }

  test("ANN on random vectors still concentrates: recall > scanned fraction") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (i.toLong, randVec(rng).toSeq))
    val corpus = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .cache()
    val queries = rows.take(16).map { case (i, v) => (i, v.toArray) }
    val truth = Recall.truthAtK(corpus, "embedding", "vec_id", queries, 10)
    val got = queries.map { case (qid, qv) =>
      qid -> Similarity.annTopK(corpus, "embedding", "vec_id", qv, 10)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    }.toMap
    val recall = Recall.recallOf(truth, got)
    val frac = queries.map { case (_, qv) =>
      Similarity.annScan(corpus, "embedding", qv).count().toDouble / 500
    }.sum / queries.size
    assert(recall > frac,
      s"recall $recall should beat the random-scan floor $frac")
    corpus.unpersist()
  }
}

/** 7z container support (commons-compress + xz ship in
  * /opt/spark/jars) — the reference's optional py7zr path
  * (undatum/common/iterable.py:10-27); round 3's one container gap
  * with no environmental excuse.
  */
class SevenZipSpec extends SparkSpecBase {

  private def write7z(path: String, inner: String, bytes: Array[Byte]): Unit = {
    val out = new org.apache.commons.compress.archivers.sevenz.SevenZOutputFile(
      new java.io.File(path))
    try {
      val e = out.createArchiveEntry(new java.io.File("."), inner)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    } finally out.close()
  }

  test("7z container round-trips through readContainer") {
    val dir = tmpDir("graft-7z")
    val archive = s"$dir/docs.csv.7z"
    write7z(archive, "docs.csv", "id,word\n1,alpha\n2,beta\n".getBytes("UTF-8"))
    val df = graft.sources.Converter.readContainer(spark, archive,
      graft.sources.Converter.ReadOptions("csv"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[String]("word") == "beta")
  }

  test("7z skips directory entries and keeps the inner suffix dispatch") {
    val dir = tmpDir("graft-7z-jsonl")
    val archive = s"$dir/events.jsonl.7z"
    write7z(archive, "nested/events.jsonl",
      """{"id":1,"kind":"click"}""" + "\n" + """{"id":2,"kind":"view"}""" + "\n",
      )
    val df = graft.sources.Converter.readContainer(spark, archive,
      graft.sources.Converter.ReadOptions("jsonl"))
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("id", "kind"))
  }

  private def write7z(path: String, inner: String, text: String): Unit =
    write7z(path, inner, text.getBytes("UTF-8"))

  test("analyzeFile reports the 7z container") {
    val dir = tmpDir("graft-7z-analyze")
    val archive = s"$dir/t.csv.7z"
    write7z(archive, "t.csv", "a,b\n1,2\n3,4\n")
    val fa = graft.operators.Analyzer.analyzeFile(spark, archive)
    assert(fa.container == "7z")
    assert(fa.format == "csv")
    assert(fa.df.count() == 2)
  }
}

/** Incremental-vocab streaming tokenizer (round-4 ask #8): ids must
  * be STABLE across micro-batches — a word keeps its first-assigned
  * id forever, new words append after all existing ids.
  */
class IncrementalVocabSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("grow is idempotent, append-only, and capped") {
    val dir = tmpDir("graft-ivocab")
    val v1 = graft.text.IncrementalVocab.grow(spark, dir,
      Seq(("the", 10L), ("cat", 5L), ("sat", 5L)), maxVocab = 4)
    assert(v1 == Map("the" -> 0, "cat" -> 1, "sat" -> 2))
    // idempotent: same words, nothing changes, no new version
    val again = graft.text.IncrementalVocab.grow(spark, dir,
      Seq(("cat", 99L), ("the", 1L)), maxVocab = 4)
    assert(again == v1)
    // append-only: a later, more frequent word cannot displace an id
    val v2 = graft.text.IncrementalVocab.grow(spark, dir,
      Seq(("zebra", 1000L), ("ant", 1000L)), maxVocab = 4)
    assert(v2("the") == 0 && v2("cat") == 1 && v2("sat") == 2)
    assert(v2("ant") == 3) // one slot left; 'ant' < 'zebra' at equal count
    assert(!v2.contains("zebra"))
    assert(graft.text.IncrementalVocab.load(spark, dir) == v2)
  }

  test("two-batch streaming ingest keeps ids stable and decodes exactly") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val vocabDir = tmpDir("graft-ivocab-stream")
    val outDir = tmpDir("graft-ivocab-out")
    val mem = MemoryStream[(String, String, String)]
    val q = graft.streaming.EncodeStream.streamingTextIngestIncremental(
      mem.toDF().toDF("doc_id", "text", "source"),
      vocabDir, outDir, oovId = -1, maxVocab = 100,
      cfg = graft.encode.TokenEncoder.EncodeConfig(targetRowsPerPart = 10))
    try {
      mem.addData(("d1", "the cat sat", "web"))
      q.processAllAvailable()
      val after1 = graft.text.IncrementalVocab.load(spark, vocabDir)
      // batch 2 reuses old words and introduces new ones
      mem.addData(("d2", "the dog sat quietly", "web"))
      q.processAllAvailable()
      val after2 = graft.text.IncrementalVocab.load(spark, vocabDir)
      // every batch-1 id survives batch 2 unchanged
      after1.foreach { case (w, id) => assert(after2(w) == id, s"id of '$w' moved") }
      assert(Set("dog", "quietly").subsetOf(after2.keySet))
      // the encoded store decodes to the ids of the FINAL vocab for
      // both batches — proof the early batch's ids were never remapped
      val decoded = Seq(0L, 1L).flatMap { b =>
        graft.encode.TokenDecoder.read(spark, s"$outDir/batch=$b").collect()
      }.map(r => r.doc_id -> r.tokens.toSeq).toMap
      def ids(text: String) = text.split(" ").map(after2).toSeq
      assert(decoded("d1") == ids("the cat sat"))
      assert(decoded("d2") == ids("the dog sat quietly"))
    } finally q.stop()
  }
}

/** Encode-store protocol regressions from ADVICE r3. */
class StoreProtocolSpec extends SparkSpecBase {
  import graft.encode.{TokenDecoder, TokenEncoder}
  import graft.encode.TokenEncoder.EncodeConfig
  import org.apache.spark.sql.functions._

  private def synth = graft.synth.TokenSynth.dataset(spark, 400, parallelism = 4)

  test("a legacy completed/ dir without runId fails loudly, not with a raw select error") {
    val out = tmpDir("legacy-completed")
    TokenEncoder.run(synth, out, EncodeConfig(targetRowsPerPart = 100))
    // simulate a pre-marker-protocol store: completed rows lack runId
    val s = spark
    import s.implicits._
    val legacy = Seq(0, 1).toDF("partId")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$out/completed"))
    legacy.write.parquet(s"$out/completed")
    val err = intercept[IllegalStateException] {
      TokenDecoder.read(spark, out).count()
    }
    assert(err.getMessage.contains("runId"))
  }

  test("run() returns ONLY this run's lineage — orphan rows don't double-count") {
    val out = tmpDir("orphan-lineage")
    val cfg = EncodeConfig(targetRowsPerPart = 100)
    val first = TokenEncoder.run(synth, out, cfg)
    val total = first.agg(sum("totalTokens")).head().getLong(0)
    // crash AFTER lineage landed, BEFORE markers: the orphan lineage
    // stays on disk under the old runId
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$out/completed"))
    val resumed = TokenEncoder.run(synth, out, cfg)
    // the resume re-encodes everything; its RETURN must aggregate to
    // the corpus total once, not once per attempt (ADVICE r3: callers
    // like Bench sum the returned lineage)
    assert(resumed.agg(sum("totalTokens")).head().getLong(0) == total)
  }
}

/** Avro over the CORE avro jar (the spark-avro connector is absent in
  * this sandbox; round 3 auto-cancelled the avro test). AvroLocal is
  * the reference-equivalent single-stream writer/reader — these tests
  * actually RUN here.
  */
class AvroLocalSpec extends SparkSpecBase {
  import graft.sources.AvroLocal

  test("avro round-trips primitives, arrays, nested structs, nulls") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha", Some(3.5), Seq(1, 2, 3), ("x", 10L)),
      (2L, "beta", None, Seq.empty[Int], ("y", 20L))
    ).toDF("id", "name", "score", "nums", "meta")
    val dir = tmpDir("graft-avro")
    val n = AvroLocal.write(df, s"$dir/t.avro")
    assert(n == 2)
    val back = AvroLocal.read(spark, s"$dir/t.avro").orderBy("id").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("name") == "alpha")
    assert(back(0).getAs[Double]("score") == 3.5)
    assert(back(1).isNullAt(back(1).fieldIndex("score")))
    assert(back(0).getAs[scala.collection.Seq[Int]]("nums").toSeq == Seq(1, 2, 3))
    assert(back(0).getAs[org.apache.spark.sql.Row]("meta").getLong(1) == 10L)
  }

  test("avro fallback engages through Converter when the connector is absent") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val dir = tmpDir("graft-avro-conv") + "/out"
    graft.sources.Converter.write(df, dir, "avro")
    val back = graft.sources.Converter.read(spark, dir,
      graft.sources.Converter.ReadOptions("avro"))
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("avro binary and timestamp columns survive (timestamp as ISO string)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3), java.sql.Timestamp.valueOf("2024-06-15 10:30:00")))
      .toDF("id", "payload", "ts")
    val dir = tmpDir("graft-avro-bin")
    AvroLocal.write(df, s"$dir/t.avro")
    val r = AvroLocal.read(spark, s"$dir/t.avro").collect()(0)
    assert(r.getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2, 3))
    assert(r.getAs[String]("ts").startsWith("2024-06-15 10:30"))
  }
}

/** Sniff breadth (round-4 ask #5): KOI8-R vs cp1251 by Cyrillic case
  * band, windows-1252 vs ISO-8859-1 by 0x80-0x9F punctuation — and
  * each detected name must actually FEED a working Spark read.
  */
class SniffBreadthSpec extends SparkSpecBase {
  import graft.sources.{Converter, Sniff}

  private val ru = "пример;данные;файл\nзначение;строка;текст\n"

  test("KOI8-R text sniffs as KOI8-R, cp1251 stays windows-1251") {
    assert(Sniff.encoding(ru.getBytes("KOI8-R")) == "KOI8-R")
    assert(Sniff.encoding(ru.getBytes("windows-1251")) == "windows-1251")
  }

  test("windows-1252 smart punctuation sniffs as windows-1252, plain latin-1 stays ISO-8859-1") {
    val smart = "price,note\n5,“café” — ok\n"
    assert(Sniff.encoding(smart.getBytes("windows-1252")) == "windows-1252")
    val plain = "price,note\n5,café\n"
    assert(Sniff.encoding(plain.getBytes("ISO-8859-1")) == "ISO-8859-1")
  }

  test("sniffed KOI8-R feeds a working csv read end-to-end") {
    val dir = tmpDir("graft-koi8")
    val p = s"$dir/ru.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "id,word\n1,данные\n".getBytes("KOI8-R"))
    val (enc, delim) = Sniff.sniffFile(p)
    assert(enc == "KOI8-R" && delim == ",")
    val df = Converter.read(spark, p,
      Converter.ReadOptions("csv", encoding = enc))
    assert(df.collect()(0).getAs[String]("word") == "данные")
  }

  test("sniffed windows-1252 feeds a working csv read end-to-end") {
    val dir = tmpDir("graft-cp1252")
    val p = s"$dir/fr.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      "id,note\n1,“café”\n".getBytes("windows-1252"))
    val (enc, _) = Sniff.sniffFile(p)
    assert(enc == "windows-1252")
    val df = Converter.read(spark, p,
      Converter.ReadOptions("csv", encoding = enc))
    assert(df.collect()(0).getAs[String]("note") == "“café”")
  }

  test("ALL-CAPS cp1251 (the inherent ambiguity) is documented as KOI8-R-shaped") {
    // uppercase-dominant Cyrillic genuinely matches KOI8-R's lowercase
    // band — chardet has the same confusion; this test pins the
    // documented behavior rather than hiding it
    val caps = "ЗАГОЛОВОК;РАЗДЕЛ\nДАННЫЕ;ТЕКСТ\n"
    assert(Sniff.encoding(caps.getBytes("windows-1251")) == "KOI8-R")
  }
}
