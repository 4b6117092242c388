package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: k-means cells
  * trained on a driver-side sample (the standard FAISS recipe —
  * training on a bounded sample is how IVF scales to 10^12 vectors),
  * then cell assignment as a columnar argmin and search restricted to
  * the `nprobe` cells nearest the query.
  *
  * Complements sign-LSH (Similarity.annTopK): IVF adapts to the data
  * distribution, LSH is data-independent.
  */
object Ivf {

  final case class IvfIndex(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
  }

  private def dist2(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { val t = a(i).toDouble - b(i); d += t * t; i += 1 }
    d
  }

  /** Deterministic Lloyd k-means on a seeded sample. */
  def train(df: DataFrame, vecCol: String, k: Int = 16,
            sampleRows: Int = 4096, iters: Int = 8, seed: Long = 42L): IvfIndex = {
    // deterministic pseudo-random sample via per-partition top-k on the
    // vector hash (no global sort, no string materialization — Spark's
    // xxhash64 hashes array<float> directly)
    val sample = df.select(vecCol)
      .where(col(vecCol).isNotNull) // a NULL vector row would NPE here
      .orderBy(xxhash64(col(vecCol)))
      .limit(sampleRows)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    // seed with DISTINCT sample rows — sampling with replacement can
    // duplicate a centroid, and a duplicate never separates (argmin
    // first-wins starves it), silently dropping the cell count below k
    val rng = new scala.util.Random(seed)
    var centroids = rng.shuffle(sample.indices.toList)
      .take(math.min(k, sample.length))
      .map(i => sample(i).clone()).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](sample(0).length))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val d = dist2(v, centroids(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < v.length) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(x => (x / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    IvfIndex(centroids)
  }

  /** Persist / reload a trained index (the FAISS write_index /
    * read_index seam): centroids as one parquet table of
    * (cell, centroid) rows, so the expensive training sample + Lloyd
    * pass runs once and searches across jobs/sessions share the index.
    */
  def save(idx: IvfIndex, spark: org.apache.spark.sql.SparkSession,
           path: String): Unit = {
    import spark.implicits._
    idx.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
    IvfIndex(spark.read.parquet(path)
      .orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray))

  /** Columnar nearest-centroid assignment: argmin over k squared
    * distances, each one native vec_dist2 kernel call.
    */
  /** WARNING Column-level form: `array(dists)` appears in both
    * array_position and array_min, so the k distance folds may
    * evaluate twice per row unless codegen CSE catches it — use
    * [[assign]] (named intermediate column) in production plans.
    */
  def cellOf(vecCol: Column, idx: IvfIndex): Column = {
    // native vec_dist2 kernel — the HOF fold ran interpreted (see
    // functions.VecDist2; fold order identical, assignments bit-equal)
    val dists = idx.centroids.map { c =>
      val cl = array(c.map(lit(_)): _*)
      graft.functions.VecDist2.vecDist2(vecCol, cl)
    }
    // index of the minimum distance
    array_position(array(dists: _*), array_min(array(dists: _*))).cast("int") - 1
  }

  def cellOfLocal(v: Array[Float], idx: IvfIndex): Int = {
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < idx.k) {
      val d = dist2(v, idx.centroids(c))
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  /** Materialize the cell assignment (the "index build" — at scale
    * this is written back as a partition column so searches prune).
    * The k distance folds land in a named column referenced twice
    * (argmin = position of min), which keeps CollapseProject from
    * inlining them — cellOf's single-expression form evaluates every
    * fold twice unless codegen CSE catches it, and HOF folds are
    * interpreted, so it never does.
    */
  def assign(df: DataFrame, vecCol: String, idx: IvfIndex): DataFrame = {
    // register on the df's OWN session (charset-clone dfs start with
    // an empty registry the active-session fallback misses)
    graft.functions.VecDist2.register(df.sparkSession)
    val dists = idx.centroids.map { c =>
      val cl = array(c.map(lit(_)): _*)
      graft.functions.VecDist2.vecDist2(col(vecCol), cl)
    }
    df.withColumn("__ivf_d", array(dists.toIndexedSeq: _*))
      .withColumn("ivf_cell",
        (array_position(col("__ivf_d"), array_min(col("__ivf_d"))) - 1).cast("int"))
      .drop("__ivf_d")
  }

  /** Multi-probe assignment: the `probes` NEAREST cells per row as an
    * `ivf_cells` array (ascending distance, deterministic index
    * tie-break). SemDeDup's cross-cell-miss knob: a pair straddling
    * one boundary still shares a cell when either side carries its
    * runner-up, at Σ|cell|²·p² pair cost — the measured
    * recall/cost lever (BENCH semdedup_recall vs _p2). Same broadcast
    * centroid literals as [[assign]], map-side only; the HOF
    * sort-of-k-structs is interpreted but k is small by construction.
    */
  def assignTop(df: DataFrame, vecCol: String, idx: IvfIndex,
                probes: Int): DataFrame = {
    graft.functions.VecDist2.register(df.sparkSession)
    val k = idx.k
    val p = math.max(1, math.min(probes, k))
    val dists = idx.centroids.map { c =>
      val cl = array(c.map(lit(_)): _*)
      graft.functions.VecDist2.vecDist2(col(vecCol), cl)
    }
    df.withColumn("__ivf_d", array(dists.toIndexedSeq: _*))
      .withColumn("ivf_cells",
        slice(transform(array_sort(zip_with(col("__ivf_d"),
          sequence(lit(0), lit(k - 1)),
          (d, i) => struct(d.as("d"), i.as("i")))),
          s => s.getField("i").cast("int")), 1, p))
      .drop("__ivf_d")
  }

  /** Persist an assigned (optionally PQ-coded) corpus PARTITIONED BY
    * CELL — the storage half of the index build. A post-scan
    * `where(ivf_cell ...)` filter still reads every file's footer and
    * row groups; over this layout the same predicate arrives as a
    * parquet PartitionFilter and the scan opens only the nprobe/k
    * slice of the corpus — at 10^12 vectors the difference between
    * scanning 100% and nprobe/k of the code column. Same pattern as
    * TokenDecoder.readSource's partId bands.
    */
  def saveAssigned(assigned: DataFrame, path: String): Unit =
    assigned.write.mode("overwrite").partitionBy("ivf_cell").parquet(path)

  /** Reload a cell-partitioned corpus; `probe`/`probeBatch` predicates
    * over it prune at the parquet scan (plan-asserted in PqSpec).
    */
  def loadAssigned(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    val df = spark.read.parquet(path)
    // partition-column type inference yields int for cell ids, but be
    // explicit: downstream joins key on ivf_cell
    df.withColumn("ivf_cell", col("ivf_cell").cast("int"))
  }

  /** The subset of rows an IVF search actually scans: the rows of the
    * `nprobe` cells nearest the query. Exposed separately from
    * `search` so the scanned set can be materialized and verified
    * externally (brute-force top-k over this subset must equal the
    * IVF result exactly; recall stays probabilistic by design).
    */
  def probe(assigned: DataFrame, idx: IvfIndex, query: Array[Float],
            nprobe: Int = 2): DataFrame = {
    val cells = idx.centroids.indices
      .sortBy(c => dist2(query, idx.centroids(c)))
      .take(nprobe)
    assigned.where(col("ivf_cell").isInCollection(cells.map(Int.box)))
  }

  /** Top-k for one query scanning only the nprobe nearest cells. */
  def search(assigned: DataFrame, vecCol: String, idCol: String,
             idx: IvfIndex, query: Array[Float], topK: Int,
             nprobe: Int = 2): DataFrame =
    Similarity.bruteTopK(probe(assigned, idx, query, nprobe),
      vecCol, idCol, query, topK)

  /** The rows a BATCH of queries scans: each query's nprobe nearest
    * cells resolve driver-side (Q x k centroid distances — trivial),
    * then ONE equi-join of the tiny broadcast (qid, cell) probe table
    * against the assigned corpus restricts the scan — rows in nobody's
    * probe set are never read past the cell filter. Returns
    * (qid, corpus columns...) — a row appears once per query probing
    * its cell.
    */
  def probeBatch(assigned: DataFrame, idx: IvfIndex,
                 queries: Seq[(Long, Array[Float])],
                 nprobe: Int = 2): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val probeSeq = queries.flatMap { case (qid, qv) =>
      idx.centroids.indices.sortBy(c => dist2(qv, idx.centroids(c)))
        .take(nprobe).map(c => (qid, c))
    }
    val probes = probeSeq.toDF("qid", "ivf_cell")
    // static IN over the UNION of probed cells, known driver-side: on a
    // cell-partitioned corpus (saveAssigned) it prunes at the parquet
    // scan (PartitionFilters); elsewhere it still skips row groups via
    // min/max stats. The broadcast join alone would not prune storage.
    val union = probeSeq.map(_._2).distinct
    assigned.where(col("ivf_cell").isInCollection(union.map(Int.box)))
      .join(broadcast(probes), Seq("ivf_cell"))
  }

  /** Score a (qid, vec, id) stream against its matching query vector
    * (broadcast qid -> vector map join) and keep each query's top-k
    * (rounded-sim desc, id tiebreak; WindowGroupLimit pushes the limit
    * below the exchange — see Similarity.bruteTopKBatch). The ONE
    * scoring definition behind searchBatch and any externally
    * restricted scan (e.g. a dumped probe subset re-scored for
    * verification) — the verified form and the production form cannot
    * diverge.
    */
  def scoreBatch(restricted: DataFrame, vecCol: String, idCol: String,
                 queries: Seq[(Long, Array[Float])], topK: Int): DataFrame = {
    val spark = restricted.sparkSession
    import spark.implicits._
    graft.functions.VecDot.register(spark)
    val qvecs = broadcast(
      queries.toDF("qid", "__qvec")
        .withColumn("__qvec", col("__qvec").cast("array<float>"))
        .withColumn("__qnrm", Similarity.norm(col("__qvec"))))
    // corpus norms below the join, query norms on the broadcast side —
    // raw cosine() re-folds both per scored pair
    val scored = restricted
      .withColumn("__nrm", Similarity.norm(col(vecCol)))
      .join(qvecs, Seq("qid"))
      .select(col("qid"), col(idCol),
        round(Similarity.dot(col(vecCol), col("__qvec"))
          / (col("__nrm") * col("__qnrm")), 3).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= topK).drop("__rn")
  }

  /** Batched IVF top-k: Q queries, one restricted corpus scan. */
  def searchBatch(assigned: DataFrame, vecCol: String, idCol: String,
                  idx: IvfIndex, queries: Seq[(Long, Array[Float])],
                  topK: Int, nprobe: Int = 2): DataFrame =
    scoreBatch(probeBatch(assigned, idx, queries, nprobe),
      vecCol, idCol, queries, topK)
}
