package graft

import org.apache.spark.sql.functions._

/** Product-quantization index: columnar encode vs local kernel, ADC
  * score = LUT-sum = dot(query, reconstruction) identities, save/load
  * round trip, and planted-structure recall of the shortlist+rerank
  * search (the production shape behind q_ann_pq).
  */
class PqSpec extends SparkSpecBase {
  import graft.sim.{Pq, Recall, Similarity}

  private val dim = 64

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  private def randVec(rng: scala.util.Random): Array[Float] =
    unit(Array.fill(dim)(rng.nextGaussian().toFloat))

  test("columnar encode matches the local kernel; ADC = dot(q, reconstruction)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map(i => (i.toLong, randVec(rng).toSeq))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = Pq.train(df, "embedding", m = 8, ksub = 16)
    assert(idx.m == 8 && idx.ksub == 16 && idx.dim == dim)

    val coded = Pq.encode(df, "embedding", idx)
      .select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    rows.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(coded(id), Pq.encodeLocal(v.toArray, idx)),
        s"vec $id")
    }

    val q = rows(0)._2.toArray
    val lut = Pq.lutOf(q, idx)
    val adc = Pq.adcScore(Pq.encode(df, "embedding", idx), "pq_code", q, idx)
      .select("vec_id", "adc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.take(50).foreach { case (id, _) =>
      val code = coded(id)
      // identity 1: columnar ADC == driver LUT fold (same order)
      val local = code.indices.foldLeft(0.0)((s2, m) => s2 + lut(m)(code(m) & 0xff))
      assert(math.abs(adc(id) - local) < 1e-9, s"vec $id lut")
      // identity 2: ADC == exact dot against the reconstruction —
      // float LUT entries vs double dot, so tolerance is float-level
      val rec = Pq.reconstructLocal(code, idx)
      val dot = rec.indices.foldLeft(0.0)((s2, j) => s2 + q(j).toDouble * rec(j))
      assert(math.abs(adc(id) - dot) < 1e-4, s"vec $id recon")
    }
  }

  test("save/load round trip reproduces identical codes") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(8)
    val rows = (0 until 200).map(i => (i.toLong, randVec(rng).toSeq))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = Pq.train(df, "embedding", m = 8, ksub = 16)
    val dir = tmpDir("pq-idx")
    Pq.save(idx, s, s"$dir/pq")
    val back = Pq.load(s, s"$dir/pq")
    assert(back.m == idx.m && back.ksub == idx.ksub && back.dsub == idx.dsub)
    rows.take(40).foreach { case (_, v) =>
      assert(java.util.Arrays.equals(
        Pq.encodeLocal(v.toArray, idx), Pq.encodeLocal(v.toArray, back)))
    }
  }

  test("shortlist+rerank recall@10 >= 0.9 on planted near-dup clusters") {
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
    val queries = bases.take(16).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val truth = Recall.truthAtK(corpus, "embedding", "vec_id", queries, 10)
    val idx = Pq.train(corpus, "embedding", m = 8, ksub = 16)
    val coded = Pq.encode(corpus, "embedding", idx).cache()
    val got = queries.map { case (qid, qv) =>
      qid -> Pq.searchRerank(coded, "embedding", "pq_code", "vec_id",
          idx, qv, 10, shortlistSize = 64)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    }.toMap
    val recall = Recall.recallOf(truth, got)
    assert(recall >= 0.9, s"PQ recall@10 = $recall at defaults")

    // rerank exactness: the returned rows equal brute-force top-k over
    // the shortlist subset (the q_ann_pq oracle contract)
    val (qid0, qv0) = queries.head
    val shortIds = Pq.shortlist(coded, "pq_code", "vec_id", qv0, idx, 64)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteTopK(
        corpus.where(col("vec_id").isInCollection(shortIds.map(Long.box))),
        "embedding", "vec_id", qv0, 10)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
    val rerank = Pq.searchRerank(coded, "embedding", "pq_code", "vec_id",
        idx, qv0, 10, shortlistSize = 64)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
    assert(rerank == brute, s"q$qid0 rerank/brute divergence")

    // batch == per-query: one code scan for all queries must return
    // exactly what Q independent searches return
    val batch = Pq.searchBatchRerank(coded, "embedding", "pq_code", "vec_id",
        idx, queries, 10, shortlistSize = 64)
      .select(col("qid"), col("vec_id").cast("long").as("id"), col("sim"))
      .collect().groupBy(_.getLong(0))
      .map { case (q2, rs) => q2 -> rs.map(r => (r.getLong(1), r.getDouble(2))).toSet }
    queries.foreach { case (qid, qv) =>
      val single = Pq.searchRerank(coded, "embedding", "pq_code", "vec_id",
          idx, qv, 10, shortlistSize = 64)
        .select(col("vec_id").cast("long"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch(qid) == single, s"q$qid batch/single divergence")
    }
    coded.unpersist(); corpus.unpersist()
  }

  test("IVF+PQ: equals PQ-rerank restricted to the probed cells; planted recall holds") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(21)
    val bases = (0 until 40).map(_ => randVec(rng))
    val rows = for { b <- bases.indices; c <- 0 until 10 } yield {
      val noisy = bases(b).map(x => x + (rng.nextGaussian() * 0.02).toFloat)
      ((b * 10 + c).toLong, unit(noisy).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .cache()
    val ivf = graft.sim.Ivf.train(corpus, "embedding", k = 8)
    val pq = Pq.train(corpus, "embedding", m = 8, ksub = 16)
    val coded = Pq.encode(
      graft.sim.Ivf.assign(corpus, "embedding", ivf), "embedding", pq).cache()
    val queries = bases.take(8).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val truth = Recall.truthAtK(corpus, "embedding", "vec_id", queries, 10)
    val got = queries.map { case (qid, qv) =>
      val res = Pq.searchIvfPq(coded, "embedding", "pq_code", "vec_id",
          ivf, pq, qv, 10, nprobe = 3, shortlistSize = 64)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
      // identity: IVF+PQ == plain PQ rerank over the probed subset
      val manual = Pq.searchRerank(
          graft.sim.Ivf.probe(coded, ivf, qv, nprobe = 3),
          "embedding", "pq_code", "vec_id", pq, qv, 10, shortlistSize = 64)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq
      assert(res == manual, s"q$qid composition identity")
      qid -> res.toSet
    }.toMap
    val recall = Recall.recallOf(truth, got)
    assert(recall >= 0.85, s"IVF+PQ recall@10 = $recall")

    // batched IVF+PQ == per-query IVF+PQ (one cell-restricted scan)
    val batch = Pq.searchBatchIvfPq(coded, "embedding", "pq_code", "vec_id",
        ivf, pq, queries, 10, nprobe = 3, shortlistSize = 64)
      .select(col("qid"), col("vec_id").cast("long").as("id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q2, rs) => q2 -> rs.map(_.getLong(1)).toSet }
    queries.foreach { case (qid, qv) =>
      val single = Pq.searchIvfPq(coded, "embedding", "pq_code", "vec_id",
          ivf, pq, qv, 10, nprobe = 3, shortlistSize = 64)
        .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
      assert(batch(qid) == single, s"q$qid ivfpq batch/single divergence")
    }
    coded.unpersist(); corpus.unpersist()
  }

  test("cell-partitioned store prunes probeBatch at the parquet scan") {
    val s = spark
    import s.implicits._
    import graft.sim.Ivf
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map(i => (i.toLong, randVec(rng).toSeq))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val ivf = Ivf.train(df, "embedding", 8)
    val pq = Pq.train(df, "embedding", m = 8, ksub = 16)
    val dir = tmpDir("ivf-store")
    Ivf.saveAssigned(Pq.encode(Ivf.assign(df, "embedding", ivf),
      "embedding", pq), s"$dir/corpus")
    val loaded = Ivf.loadAssigned(s, s"$dir/corpus")
    val queries = (0 until 3).map(i => (i.toLong, rows(i * 50)._2.toArray))
    val probed = Ivf.probeBatch(loaded, ivf, queries, nprobe = 2)
    // the probed-cell union must arrive as a parquet PartitionFilter,
    // and the scan must open strictly fewer partitions than exist
    // (descend through AQE wrappers — their children are hidden from
    // a plain collect)
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansOf(a.executedPlan)
        case _ => Nil
      }
    val scans = scansOf(probed.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no parquet scan in the probeBatch plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "ivf_cell")),
      s"no ivf_cell PartitionFilter: ${scan.partitionFilters}")
    val probedCells = queries.flatMap { case (_, qv) =>
      ivf.centroids.indices.sortBy(c =>
        qv.indices.map(j => (qv(j) - ivf.centroids(c)(j)).toDouble)
          .map(d => d * d).sum).take(2)
    }.distinct
    val cellsOnDisk = new java.io.File(s"$dir/corpus").listFiles()
      .count(_.getName.startsWith("ivf_cell="))
    assert(probedCells.size < cellsOnDisk,
      "test needs a probe set smaller than the cell count")
    assert(scan.selectedPartitions.partitionCount == probedCells.size,
      s"scan opened ${scan.selectedPartitions.partitionCount} partitions, " +
        s"expected ${probedCells.size} of $cellsOnDisk")
    // results off the pruned store equal the in-memory assigned path
    val direct = Pq.searchBatchIvfPq(
      Pq.encode(Ivf.assign(df, "embedding", ivf), "embedding", pq),
      "embedding", "pq_code", "vec_id", ivf, pq, queries, topK = 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Pq.searchBatchIvfPq(loaded, "embedding", "pq_code",
      "vec_id", ivf, pq, queries, topK = 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == direct)
  }
}
