package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column:
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketing as the scale path (Charikar '02 —
  * public). Dot products stay columnar via `zip_with` + `aggregate`
  * higher-order functions (codegen'd, no UDF).
  */
object Similarity {

  /** Sequential-order double dot product of two float-array columns.
    * Matches a DuckDB list_sum(list_transform(...)) oracle bit-for-bit
    * because both fold left in index order over doubles.
    *
    * Round 3: native codegen'd kernel (functions.VecDot) — the HOF
    * chain (`aggregate(zip_with(...))`) runs interpreted (HOFs have no
    * codegen path) and was the per-comparison cost on every similarity
    * query; the kernel folds in the identical order, so every oracle
    * value is unchanged. `dotHof` keeps the declarative reference
    * formulation for the equivalence property test.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VecDot.vecDot(a, b)

  /** Register the native kernels on the DataFrame's OWN session — a
    * charset-clone df (Converter.read exotic encodings) starts with an
    * empty registry the Column helpers' active-session fallback misses.
    */
  private def ensureKernels(df: DataFrame): Unit =
    graft.functions.VecDot.register(df.sparkSession)

  /** Declarative reference formulation (interpreted; test-only). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors of one query vector (broadcast as a
    * literal array): one scan, one narrow top-k — the baseline.
    */
  def bruteTopK(df: DataFrame, vecCol: String, idCol: String,
                query: Array[Float], k: Int): DataFrame = {
    ensureKernels(df)
    val q = array(query.map(v => lit(v)): _*)
    df.select(col(idCol), round(cosine(col(vecCol), q), 3).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Batched exact top-k: many query vectors against the corpus in
    * ONE scan. The query set is broadcast (it is the small side by
    * definition); each corpus row scores against every query, then a
    * per-query window keeps the top k. Catalyst inserts
    * WindowGroupLimit BELOW the exchange (rank-limit pushdown, plan
    * asserted by the q_ann_batch explain), so each input partition
    * ships at most k (qid, id, sim) scalar rows per query — the
    * shuffle is O(partitions x Q x k), independent of corpus size.
    * One scan for Q queries vs Q scans of `bruteTopK` is the batch
    * win; chunk the query set when Q itself is large.
    */
  def bruteTopKBatch(df: DataFrame, vecCol: String, idCol: String,
                     queries: DataFrame, qidCol: String, qvecCol: String,
                     k: Int): DataFrame = {
    ensureKernels(df)
    // norms computed BELOW the join — raw cosine() would re-fold
    // dot(v,v) once per query and dot(q,q) once per corpus row (the
    // 3-passes-per-pair shape the within-block path already fixed)
    val q = broadcast(
      queries.select(col(qidCol).as("qid"), col(qvecCol).as("__qvec"),
        norm(col(qvecCol)).as("__qnrm")))
    val docs = df.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__nrm"))
    val scored = docs.crossJoin(q)
      .select(col("qid"), col(idCol),
        round(dot(col(vecCol), col("__qvec")) / (col("__nrm") * col("__qnrm")),
          3).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }

  /** All pairs with cosine >= threshold within a blocking column
    * (e.g. a label or an LSH bucket) — embedding-cosine near-dup.
    *
    * Each vector's norm is computed ONCE below the self-join and
    * carried as a scalar column, so the per-pair work is a single dot
    * fold plus one divide (round 1 evaluated dot/(norm*norm) per
    * joined row — 3 array passes per pair, the worst query in
    * BENCH_r01 at 36.3s). The norm stays a separate column rather
    * than a pre-normalized array because CollapseProject inlines
    * single-use aliases into HOF lambdas — a `transform(v, x/nrm)`
    * formulation gets its SQRT re-evaluated PER ELEMENT; the join
    * boundary here is the barrier that keeps the norm per-row.
    *
    * maxPerBlock > 0 caps a block's row count (row_number over id) —
    * the pressure valve for one hot block going |block|^2 at scale, at
    * a documented recall cost. 0 = exact all-pairs-within-block,
    * guarded by `autoLshBlockLimit`: a cheap driver-side
    * groupBy(blk).count() probe (one agg over 8-byte keys — O(rows)
    * map-side-combined, never materializing pairs) checks the largest
    * block. When it exceeds the limit the call REFUSES by default
    * (`onHotBlock = "error"`) — an exact API must not silently hand
    * back probabilistic results; `onHotBlock = "divert"` opts into
    * auto-diverting to `cosinePairsLsh`, whose (block, sign-LSH
    * bucket) keys turn the hot block's |block|^2 into a sum of
    * |bucket|^2 — the 100-TB path, logged, with recall following the
    * LSH contract instead of exact.
    * autoLshBlockLimit <= 0 disables the guard (explicit
    * exact-at-any-cost — also skips the probe, making the call fully
    * lazy; with the guard on, CONSTRUCTING the plan runs the one
    * cheap probe job eagerly). Default 4096: 4096^2 = 16.7M pairs x
    * ~0.5KB/pair of shuffled vectors ~ 8GB for ONE block — about the
    * most a single task group should ever carry.
    */
  def cosinePairsWithin(df: DataFrame, vecCol: String, idCol: String,
                        blockCol: String, threshold: Double,
                        maxPerBlock: Int = 0,
                        autoLshBlockLimit: Int = 4096,
                        onHotBlock: String = "error"): DataFrame = {
    ensureKernels(df)
    require(onHotBlock == "error" || onHotBlock == "divert",
      s"onHotBlock must be 'error' or 'divert', got '$onHotBlock'")
    if (maxPerBlock <= 0 && autoLshBlockLimit > 0) {
      val hottest = df.groupBy(col(blockCol)).count()
        .agg(max(col("count"))).head()
      val maxBlock = if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
      if (maxBlock > autoLshBlockLimit) {
        // an EXACT api silently returning probabilistic LSH results
        // (the round-3 behavior) let exact-expecting callers receive
        // reduced recall with only a log line as notice — refuse by
        // default, like connectedComponents refuses non-convergence;
        // the caller chooses the resolution explicitly
        if (onHotBlock == "error")
          throw new IllegalArgumentException(
            s"cosinePairsWithin: hottest '$blockCol' block has $maxBlock rows " +
            s"(> autoLshBlockLimit=$autoLshBlockLimit) — exact all-pairs would " +
            "materialize |block|^2 vector pairs. Pass onHotBlock=\"divert\" for " +
            "the LSH-bucketed approximate path, set maxPerBlock to cap blocks, " +
            "call cosinePairsLsh directly, or raise autoLshBlockLimit " +
            "(<= 0 = exact at any cost, fully lazy)")
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"cosinePairsWithin: hottest '$blockCol' block has $maxBlock rows " +
          s"(> $autoLshBlockLimit); diverting to the LSH-bucketed path")
        return cosinePairsLsh(df, vecCol, idCol, blockCol, threshold)
      }
    }
    val s0 = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val s =
      if (maxPerBlock > 0)
        s0.withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("blk").orderBy("id")))
          .where(col("__rn") <= maxPerBlock).drop("__rn")
      else s0
    val a = s.select(col("blk"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = s.select(col("blk"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("blk")).where(col("id_a") < col("id_b"))
      .withColumn("sim",
        dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 3).as("sim"))
  }

  /** Approximate all-pairs cosine at scale: blocks on
    * (blockCol, sign-LSH bucket) instead of blockCol alone, so a hot
    * block's |block|^2 becomes sum over buckets of |bucket|^2 — the
    * 100-TB path when exact within-block pairs would blow up. Probing
    * each vector into its own bucket plus all hamming-1 neighbors
    * keeps recall high at the usual LSH cost/recall trade (both sides
    * probe, so only pairs hashing more than 2 of the nPlanes bits
    * apart are missed; P(miss) falls with cosine similarity). Pairs
    * dedupe on bare ids before scoring.
    */
  def cosineLshCandidates(df: DataFrame, vecCol: String, idCol: String,
                          blockCol: String, nPlanes: Int = 6,
                          seed: Long = 42L): DataFrame = {
    ensureKernels(df)
    // dimensionality probe: an empty corpus has no pairs (and no dim).
    // The empty result reuses the INPUT id column's type — a literal
    // 0L schema would be bigint even for string ids, and a caller
    // unioning empty and non-empty runs would hit a schema mismatch
    // skip NULL vectors in the probe (one leading null row would NPE
    // the dimensionality read; null-vec rows never join anyway)
    val first = df.select(col(vecCol)).where(col(vecCol).isNotNull).take(1)
    if (first.isEmpty)
      return df.select(col(idCol).as("id_a"), col(idCol).as("id_b")).limit(0)
    val dim = first(0).getSeq[Float](0).length
    val ps = planes(nPlanes, dim, seed)
    val base = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        col(vecCol).as("v"))
      .withColumn("b0", lshBucket(col("v"), ps))
    // probe set: own bucket + hamming-1 neighbors (multi-probe LSH)
    val probed = base.withColumn("bkt",
      explode(array((col("b0") +: (0 until nPlanes)
        .map(i => col("b0").bitwiseXOR(lit(1L << i)))): _*)))
    val a = probed.select(col("blk"), col("bkt"), col("id").as("id_a"))
    val b = probed.select(col("blk"), col("bkt"), col("id").as("id_b"))
    a.join(b, Seq("blk", "bkt")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
  }

  /** Score bare candidate id pairs: cosine >= threshold, norms
    * computed once per vector below the join (see cosinePairsWithin).
    */
  def cosineScorePairs(df: DataFrame, cand: DataFrame, vecCol: String,
                       idCol: String, threshold: Double): DataFrame = {
    ensureKernels(df)
    val docs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"))
    cand.select("id_a", "id_b")
      .join(docs.select(col("id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("nrm_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("nrm_b")), Seq("id_b"))
      .withColumn("sim",
        dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 3).as("sim"))
  }

  def cosinePairsLsh(df: DataFrame, vecCol: String, idCol: String,
                     blockCol: String, threshold: Double,
                     nPlanes: Int = 6, seed: Long = 42L): DataFrame =
    cosineScorePairs(df,
      cosineLshCandidates(df, vecCol, idCol, blockCol, nPlanes, seed),
      vecCol, idCol, threshold)

  /** Symmetric int8 embedding quantization for storage: per-vector
    * max-abs scale, codes in [-127, 127] plus one float scale column —
    * 4x smaller than float32 at ~0.5% cosine error for random vectors
    * (classic FAISS SQ8 recipe). Fully columnar; dequantize restores
    * approximate floats for any downstream cosine op.
    */
  /** NOTE Column-level form: CollapseProject inlines the scale
    * expression into the per-element lambda, re-running the O(d)
    * max-abs pass PER ELEMENT — use [[quantizeInt8Col]] (df-level,
    * named scale column) on real corpora; this form stays for
    * expression-shaped call sites and tiny vectors.
    */
  def quantizeInt8(vecCol: Column): Column = {
    val scale = array_max(transform(vecCol, x => abs(x))) / lit(127.0)
    struct(
      // an all-zero vector has scale 0 and x/0 is NULL per element
      // (non-ANSI) — emit zero codes instead of a silently-null row
      when(scale === 0,
        transform(vecCol, _ => lit(0).cast("byte")))
        .otherwise(transform(vecCol, x =>
          round(x.cast("double") / scale).cast("byte"))).as("codes"),
      scale.cast("float").as("scale"))
  }

  /** df-level quantization: the max-abs scale lands in a NAMED column
    * first, so it is computed once per row (the Column form above
    * re-evaluates it per element after CollapseProject inlining —
    * the same HOF-lambda trap documented at cosinePairsWithin).
    * Returns df with `outCol` = struct(codes, scale).
    */
  def quantizeInt8Col(df: DataFrame, vecCol: String,
                      outCol: String): DataFrame = {
    val scaled = df.withColumn("__q_scale",
      (array_max(transform(col(vecCol), x => abs(x))) / lit(127.0))
        .cast("double"))
    scaled.withColumn(outCol, struct(
        when(col("__q_scale") === 0,
          transform(col(vecCol), _ => lit(0).cast("byte")))
          .otherwise(transform(col(vecCol), x =>
            round(x.cast("double") / col("__q_scale")).cast("byte")))
          .as("codes"),
        col("__q_scale").cast("float").as("scale")))
      .drop("__q_scale")
  }

  def dequantizeInt8(qCol: Column): Column =
    transform(qCol.getField("codes"),
      c => (c.cast("double") * qCol.getField("scale").cast("double")).cast("float"))
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)((rng.nextGaussian()).toFloat))
  }

  /** Sign-LSH bucket id: one bit per hyperplane. Vectors in the same
    * bucket are cosine-close with high probability; search cost drops
    * from O(N) to O(N / 2^nPlanes) per query at some recall loss.
    */
  def lshBucket(vecCol: Column, ps: Array[Array[Float]]): Column = {
    val bits = ps.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit(_)): _*)
      when(dot(vecCol, pl) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** The subset of rows an LSH ANN search actually scans: the query's
    * bucket plus (optionally) all hamming-1 neighbor buckets. Exposed
    * separately from `annTopK` so the scanned set can be materialized
    * and verified externally — a brute-force top-k over this subset
    * must equal the ANN result exactly, leaving only recall (which is
    * probabilistic by design) outside the deterministic contract.
    */
  def annScan(df: DataFrame, vecCol: String, query: Array[Float],
              nPlanes: Int = 8, probeNeighbors: Boolean = true,
              seed: Long = 42L, probeRadius: Int = 1): DataFrame = {
    ensureKernels(df)
    val ps = planes(nPlanes, query.length, seed)
    def bucketOf(v: Array[Float]): Long = {
      var b = 0L
      ps.zipWithIndex.foreach { case (p, i) =>
        var d = 0.0
        var j = 0
        while (j < v.length) { d += p(j).toDouble * v(j); j += 1 }
        if (d >= 0) b |= (1L << i)
      }
      b
    }
    val qb = bucketOf(query)
    // multi-probe: all buckets within hamming distance `probeRadius`
    // of the query's bucket (radius r scans sum_{i<=r} C(nPlanes, i)
    // of the 2^nPlanes buckets — the recall/scan-fraction knob; a
    // near neighbor at angle theta flips each bit with prob theta/pi,
    // so most misses are 1-2 bits away). probeNeighbors=false forces
    // radius 0 (exact-bucket only), kept for compatibility.
    val radius = if (probeNeighbors) math.max(0, probeRadius) else 0
    def expand(bs: Set[Long]): Set[Long] =
      bs ++ bs.flatMap(b => (0 until nPlanes).map(i => b ^ (1L << i)))
    val probes = (1 to radius).foldLeft(Set(qb))((acc, _) => expand(acc))
    df.withColumn("__bucket", lshBucket(col(vecCol), ps))
      .where(col("__bucket").isInCollection(probes))
      .drop("__bucket")
  }

  /** ANN top-k for one query via LSH: scan only the query's bucket
    * plus all buckets within `probeRadius` bit flips (recall grows
    * with the scanned fraction; radius nPlanes = brute force).
    */
  def annTopK(df: DataFrame, vecCol: String, idCol: String,
              query: Array[Float], k: Int, nPlanes: Int = 8,
              probeNeighbors: Boolean = true, seed: Long = 42L,
              probeRadius: Int = 1): DataFrame =
    bruteTopK(annScan(df, vecCol, query, nPlanes, probeNeighbors, seed,
      probeRadius), vecCol, idCol, query, k)
}
