package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding-scale similarity search:
  * split the vector into `m` contiguous subspaces, k-means each
  * subspace on a bounded driver-side sample, and store each corpus
  * vector as `m` small centroid codes (1 byte each). A query then
  * scans CODES, not floats: per-subspace partial-dot lookup tables
  * (ADC — asymmetric distance computation) turn scoring into `m`
  * table lookups + adds per row.
  *
  * Scale story (the reason PQ exists): at m=8, ksub=16 a 64-dim float
  * corpus column (256 B/row) becomes 8 B/row — a 32x smaller scan,
  * and the scan is pure int indexing (no float decode). The standard
  * production shape is ADC shortlist -> exact rerank of the top-C
  * candidates, which is what [[searchRerank]] implements; the final
  * ordering is therefore EXACT over the shortlist (deterministic,
  * oracle-checkable), with only shortlist membership approximate —
  * the same verification split as IVF/LSH (graft.sim.Ivf, ann
  * queries in SparkEntry).
  *
  * Training on a bounded sample is the standard FAISS recipe (same
  * rationale as Ivf.train). Codebooks are tiny (m*ksub*dsub floats,
  * ~4 KB at the defaults) and ship to executors inside the encode /
  * score closures.
  */
object Pq {

  /** `codebooks(sub)(code)` = centroid of subspace `sub` for `code`;
    * all subspaces share `ksub` and `dsub` (dim = m * dsub).
    */
  final case class PqIndex(dsub: Int, codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def dim: Int = m * dsub
  }

  private def dist2(a: Array[Float], aOff: Int, b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < b.length) { val t = a(aOff + i).toDouble - b(i); d += t * t; i += 1 }
    d
  }

  /** Deterministic per-subspace Lloyd k-means on a seeded sample
    * (sampling scheme identical to Ivf.train: xxhash64 order, no
    * global sort at scale beyond the top-k).
    */
  def train(df: DataFrame, vecCol: String, m: Int = 8, ksub: Int = 16,
            sampleRows: Int = 4096, iters: Int = 8, seed: Long = 42L): PqIndex = {
    val sample = df.select(vecCol)
      .where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(vecCol)))
      .limit(sampleRows)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val rng = new scala.util.Random(seed)
    val books = Array.tabulate(m) { sub =>
      val off = sub * dsub
      // distinct seeding, same starvation rationale as Ivf.train
      var cents = rng.shuffle(sample.indices.toList)
        .take(math.min(ksub, sample.length))
        .map(i => java.util.Arrays.copyOfRange(sample(i), off, off + dsub)).toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Int](cents.length)
        sample.foreach { v =>
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < cents.length) {
            val d = dist2(v, off, cents(c))
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += v(off + j); j += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(x => (x / counts(c)).toFloat)
        }.toArray
        it += 1
      }
      cents
    }
    PqIndex(dsub, books)
  }

  /** Persist / reload (the FAISS write_index seam, like Ivf.save):
    * one parquet table of (sub, code, centroid) rows.
    */
  def save(idx: PqIndex, spark: org.apache.spark.sql.SparkSession,
           path: String): Unit = {
    import spark.implicits._
    (for {
      sub <- idx.codebooks.indices
      code <- idx.codebooks(sub).indices
    } yield (sub, code, idx.codebooks(sub)(code).toSeq))
      .toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
    val rows = spark.read.parquet(path).orderBy("sub", "code").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = Array.tabulate(m) { sub =>
      rows.filter(_.getInt(0) == sub).map(_.getSeq[Float](2).toArray)
    }
    PqIndex(books(0)(0).length, books)
  }

  def encodeLocal(v: Array[Float], idx: PqIndex): Array[Byte] = {
    val out = new Array[Byte](idx.m)
    var sub = 0
    while (sub < idx.m) {
      val off = sub * idx.dsub
      val book = idx.codebooks(sub)
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < book.length) {
        val d = dist2(v, off, book(c))
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    out
  }

  /** Reconstruction (decode) of a code back to its centroid
    * concatenation — the vector the ADC score actually "sees".
    */
  def reconstructLocal(code: Array[Byte], idx: PqIndex): Array[Float] = {
    val out = new Array[Float](idx.dim)
    var sub = 0
    while (sub < idx.m) {
      System.arraycopy(idx.codebooks(sub)(code(sub) & 0xff), 0,
        out, sub * idx.dsub, idx.dsub)
      sub += 1
    }
    out
  }

  /** Materialize the code column (`pq_code: binary`, m bytes/row) —
    * the "index build". A closure-shipped kernel rather than a
    * Catalyst expression: the output is a variable-shape byte array
    * driven by a 3-level nested codebook, which an Expression would
    * evaluate through the same JIT'd loop — there is no codegen win
    * to buy, unlike the scalar vec_dot/vec_dist2 kernels.
    */
  def encode(df: DataFrame, vecCol: String, idx: PqIndex,
             codeCol: String = "pq_code"): DataFrame = {
    val enc = udf { (v: Seq[Float]) =>
      if (v == null) null else encodeLocal(v.toArray, idx)
    }
    df.withColumn(codeCol, enc(col(vecCol)))
  }

  /** ADC lookup table for one query: `lut(sub)(code)` = partial dot
    * of the query's subvector with that centroid. Approximate score
    * of a coded row = sum over subspaces — see [[adcScore]].
    */
  def lutOf(query: Array[Float], idx: PqIndex): Array[Array[Float]] =
    Array.tabulate(idx.m) { sub =>
      val off = sub * idx.dsub
      idx.codebooks(sub).map { c =>
        var s = 0.0
        var j = 0
        while (j < idx.dsub) { s += query(off + j).toDouble * c(j); j += 1 }
        s.toFloat
      }
    }

  /** Approximate dot(query, row) from codes alone: m lookups + adds.
    * Deterministic per row (fixed subspace fold order).
    */
  def adcScore(df: DataFrame, codeCol: String, query: Array[Float],
               idx: PqIndex, scoreCol: String = "adc"): DataFrame = {
    val lut = lutOf(query, idx)
    val score = udf { (code: Array[Byte]) =>
      if (code == null) null
      else {
        var s = 0.0
        var sub = 0
        while (sub < lut.length) { s += lut(sub)(code(sub) & 0xff); sub += 1 }
        java.lang.Double.valueOf(s)
      }
    }
    df.withColumn(scoreCol, score(col(codeCol)))
  }

  /** The shortlist an ADC scan keeps for exact rerank: global top-C
    * by approximate dot (id tiebreak). TakeOrderedAndProject — per-
    * partition top-C then a driver merge of C-sized heaps, never a
    * full sort.
    */
  def shortlist(encoded: DataFrame, codeCol: String, idCol: String,
                query: Array[Float], idx: PqIndex, c: Int): DataFrame =
    // score under a reserved name: a corpus column literally called
    // "adc" must survive the shortlist untouched
    adcScore(encoded, codeCol, query, idx, scoreCol = "__adc")
      .orderBy(col("__adc").desc, col(idCol))
      .limit(c)
      .drop("__adc")

  /** PQ search, production shape: ADC shortlist of `shortlistSize`
    * candidates, then EXACT cosine top-k over the shortlist. The
    * returned ordering is exact over the scanned subset — identical
    * verification contract to Ivf.search / Similarity.annTopK.
    */
  def searchRerank(encoded: DataFrame, vecCol: String, codeCol: String,
                   idCol: String, idx: PqIndex, query: Array[Float],
                   topK: Int, shortlistSize: Int = 100): DataFrame =
    Similarity.bruteTopK(
      shortlist(encoded, codeCol, idCol, query, idx, shortlistSize),
      vecCol, idCol, query, topK)

  /** Batched ADC shortlists: Q queries, ONE scan of the code column
    * (the Ivf.probeBatch shape). All Q lookup tables resolve
    * driver-side (Q x m x ksub floats — KBs) and ship in the scoring
    * closure; each code row is scored once per query via a broadcast
    * qid cross join, and the per-qid top-C survives a
    * WindowGroupLimit (limit pushed below the exchange, so the
    * shuffle carries O(partitions x Q x C) scalars, not Q x n).
    * Returns (qid, corpus columns...).
    */
  def shortlistBatch(encoded: DataFrame, codeCol: String, idCol: String,
                     queries: Seq[(Long, Array[Float])], idx: PqIndex,
                     c: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val luts: Map[Long, Array[Array[Float]]] =
      queries.map { case (qid, qv) => qid -> lutOf(qv, idx) }.toMap
    val score = udf { (code: Array[Byte], qid: Long) =>
      if (code == null) null
      else {
        val lut = luts(qid)
        var s = 0.0
        var sub = 0
        while (sub < lut.length) { s += lut(sub)(code(sub) & 0xff); sub += 1 }
        java.lang.Double.valueOf(s)
      }
    }
    val qids = broadcast(queries.map(_._1).toDF("qid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("__adc").desc, col(idCol))
    // null-coded rows score null __adc and sort LAST under desc, but a
    // qid with fewer than c coded rows would still admit them into the
    // shortlist (and so into the exact rerank) — drop them up front,
    // matching the single-query shortlist's effective behavior
    encoded.where(col(codeCol).isNotNull).crossJoin(qids)
      .withColumn("__adc", score(col(codeCol), col("qid")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= c)
      .drop("__adc", "__rn")
  }

  /** Batched PQ search: ADC shortlists for all Q queries off one code
    * scan, then the SAME exact scoring definition as batched IVF
    * (Ivf.scoreBatch) over the union of shortlists — verified and
    * production forms cannot diverge.
    */
  def searchBatchRerank(encoded: DataFrame, vecCol: String, codeCol: String,
                        idCol: String, idx: PqIndex,
                        queries: Seq[(Long, Array[Float])], topK: Int,
                        shortlistSize: Int = 100): DataFrame =
    Ivf.scoreBatch(
      shortlistBatch(encoded, codeCol, idCol, queries, idx, shortlistSize),
      vecCol, idCol, queries, topK)

  /** Per-qid ADC shortlists over rows that ALREADY carry a `qid`
    * column (e.g. Ivf.probeBatch output) — [[shortlistBatch]] minus
    * the cross join: each probed (row, qid) pair scores once against
    * its query's LUT, per-qid top-C via the same WindowGroupLimit.
    */
  def shortlistScored(restricted: DataFrame, codeCol: String, idCol: String,
                      queries: Seq[(Long, Array[Float])], idx: PqIndex,
                      c: Int): DataFrame = {
    val luts: Map[Long, Array[Array[Float]]] =
      queries.map { case (qid, qv) => qid -> lutOf(qv, idx) }.toMap
    val score = udf { (code: Array[Byte], qid: Long) =>
      if (code == null) null
      else {
        val lut = luts(qid)
        var s = 0.0
        var sub = 0
        while (sub < lut.length) { s += lut(sub)(code(sub) & 0xff); sub += 1 }
        java.lang.Double.valueOf(s)
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("__adc").desc, col(idCol))
    // same null-code guard as shortlistBatch (see comment there)
    restricted.where(col(codeCol).isNotNull)
      .withColumn("__adc", score(col(codeCol), col("qid")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= c)
      .drop("__adc", "__rn")
  }

  /** Batched IVF+PQ: Q queries, ONE cell-restricted scan of the code
    * column (Ivf.probeBatch resolves each query's nprobe cells
    * driver-side into a broadcast probe table), per-qid ADC
    * shortlists, exact rerank through the shared Ivf.scoreBatch.
    */
  def searchBatchIvfPq(assignedCoded: DataFrame, vecCol: String,
                       codeCol: String, idCol: String, ivf: Ivf.IvfIndex,
                       pq: PqIndex, queries: Seq[(Long, Array[Float])],
                       topK: Int, nprobe: Int = 2,
                       shortlistSize: Int = 100): DataFrame =
    Ivf.scoreBatch(
      shortlistScored(Ivf.probeBatch(assignedCoded, ivf, queries, nprobe),
        codeCol, idCol, queries, pq, shortlistSize),
      vecCol, idCol, queries, topK)

  /** IVF+PQ — the standard FAISS composition (IndexIVFPQ) and the
    * actual 10^12-vector production index: IVF cells prune the scan to
    * `nprobe` cells, PQ codes make the surviving scan 32x narrower,
    * ADC keeps a shortlist, exact rerank orders it. Composes the two
    * trained indexes as-is: rows need `ivf_cell` (Ivf.assign) and a
    * code column (Pq.encode). The scanned set (probed cells) and the
    * shortlist stay exposed through the same seams as the parts, so
    * the verification story carries over unchanged.
    */
  def searchIvfPq(assignedCoded: DataFrame, vecCol: String, codeCol: String,
                  idCol: String, ivf: Ivf.IvfIndex, pq: PqIndex,
                  query: Array[Float], topK: Int, nprobe: Int = 2,
                  shortlistSize: Int = 100): DataFrame =
    searchRerank(Ivf.probe(assignedCoded, ivf, query, nprobe),
      vecCol, codeCol, idCol, pq, query, topK, shortlistSize)
}
