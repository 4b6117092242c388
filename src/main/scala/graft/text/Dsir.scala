package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw document by how target-like its
  * hashed n-gram distribution is, then sample the training subset
  * with Gumbel top-k (= sampling without replacement proportional to
  * the importance weights).
  *
  * Spark-first shape, built for the 100-TB raw corpus:
  *  - features are md5-hex-prefix buckets of unigrams + bigrams —
  *    chained built-ins (split/transform/md5/substring), codegen'd,
  *    and byte-identically reproducible in the DuckDB oracle;
  *  - the two bucket histograms are B-bounded aggregates (B = 16^h,
  *    h = `hexChars`; map-side combined, then a collect of at most
  *    2·B rows — B is a few thousand, never corpus-sized);
  *  - per-bucket log importance ratios are broadcast as a map
  *    LITERAL, so per-doc scoring is ONE shuffle-free scan:
  *    `aggregate(features, 0L, acc + lookup)`;
  *  - all ratios live on an integer micro-nat lattice
  *    (floor(ln(pt/pr)·1e6 + 0.5)) — per-doc weights are exact
  *    BIGINT sums, immune to float-summation order across engines;
  *  - resampling is `orderBy(key).limit(n)` = TakeOrdered: per
  *    partition top-n, no global sort. The Gumbel noise is
  *    deterministic (derived from md5(id)), so runs are reproducible
  *    and the oracle can replay the draw.
  */
object Dsir {

  /** Hashed n-gram features: one bucket string (first `hexChars` hex
    * chars of md5) per unigram and per bigram. Empty/short texts
    * degrade gracefully (no bigrams below 2 words, empty array for
    * empty text).
    */
  def features(text: Column, hexChars: Int): Column = {
    val ws = filter(split(lower(text), "\\s+"), w => w =!= lit(""))
    val uni = transform(ws, w => substring(md5(w), 1, hexChars))
    val bi = when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => substring(md5(concat_ws(" ", slice(ws, i + 1, lit(2)))), 1,
          hexChars)))
      .otherwise(array().cast("array<string>"))
    concat(uni, bi)
  }

  /** Per-bucket feature counts — a B-bounded aggregate (map-side
    * combine collapses each partition to ≤16^hexChars rows before the
    * exchange).
    */
  def bucketCounts(df: DataFrame, textCol: String, hexChars: Int): DataFrame =
    df.select(explode(features(col(textCol), hexChars)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).cast("long").as("n"))

  /** Learn per-bucket log(p_target/p_raw) in micro-nats with add-one
    * smoothing over the full 16^hexChars space. Returns (map for the
    * observed buckets, default for never-observed buckets). The two
    * collects are ≤16^hexChars rows each — the deliberate knob: h=2
    * is 256 buckets, h=4 is 65,536; the paper's 10k-bucket regime sits
    * between h=3 and h=4.
    */
  def logRatiosMicro(target: DataFrame, raw: DataFrame, textCol: String,
      hexChars: Int): (Map[String, Long], Long) = {
    require(hexChars >= 1 && hexChars <= 4,
      s"hexChars must be in [1,4] (bucket space 16..65536), got $hexChars")
    val b = math.pow(16.0, hexChars).toLong
    def counts(df: DataFrame): Map[String, Long] =
      bucketCounts(df, textCol, hexChars).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ct = counts(target)
    val cr = counts(raw)
    val tt = ct.values.sum
    val tr = cr.values.sum
    // floor(x+0.5) on BOTH engines (DuckDB round() is half-away-from-
    // zero; java round is floor(x+0.5) — spell it out so negatives
    // can't diverge)
    def ratio(c1: Long, c2: Long): Long =
      math.floor(math.log(
        ((c1 + 1).toDouble / (tt + b)) / ((c2 + 1).toDouble / (tr + b)))
        * 1e6 + 0.5).toLong
    val keys = ct.keySet ++ cr.keySet
    (keys.iterator.map(k => k -> ratio(ct.getOrElse(k, 0L),
      cr.getOrElse(k, 0L))).toMap, ratio(0L, 0L))
  }

  /** Per-document importance weight in micro-nats: one shuffle-free
    * scan. Features stay in codegen (split/md5/substring); the ratio
    * table ships as a Spark broadcast consulted by one O(1)-per-
    * feature udf — a map LITERAL would be a linear probe per feature
    * (GetMapValue has no hash index; measured 10× slower at 256
    * entries — same trade as [[TextOps.tokenize]]). `defaultMicro`
    * covers buckets unseen at learn time.
    */
  def docLogWeightsMicro(df: DataFrame, idCol: String, textCol: String,
      ratios: Map[String, Long], defaultMicro: Long,
      hexChars: Int): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(ratios)
    val sumRatios = udf { fs: Seq[String] =>
      var s = 0L; val it = fs.iterator
      while (it.hasNext) s += bc.value.getOrElse(it.next(), defaultMicro)
      s
    }
    df.select(col(idCol),
      sumRatios(features(col(textCol), hexChars)).as("log_w_micro"))
  }

  /** Deterministic standard-Gumbel draw in micro-nats, seeded by
    * md5(id): u = (h24 + 0.5) / 2^24 ∈ (0,1), g = -ln(-ln(u)).
    * Reproducible across runs AND engines (the oracle replays it).
    */
  def gumbelKeyMicro(id: Column): Column = {
    val h = conv(substring(md5(id.cast("string")), 1, 6), 16, 10)
      .cast("double")
    val u = (h + lit(0.5)) / lit(16777216.0)
    floor(-log(-log(u)) * 1e6 + 0.5).cast("long")
  }

  /** Gumbel top-k resample: keep the n docs with the largest
    * log_w_micro + Gumbel noise — equivalent to weighted sampling
    * without replacement proportional to exp(log_w). Ties break on
    * id. orderBy+limit compiles to TakeOrdered (per-partition top-n,
    * then a single n-row merge on the driver — no global sort).
    */
  def resample(weights: DataFrame, idCol: String, n: Int): DataFrame =
    weights
      .withColumn("key_micro", col("log_w_micro") + gumbelKeyMicro(col(idCol)))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(n)

  // ---- fast path: xxhash64-bucketed features via the native one-pass
  // kernel ([[graft.functions.DsirBuckets]]). Same algorithm, same
  // shapes; the hash function differs from the md5 portable form (so
  // bucket collisions differ slightly), which is why the md5 form
  // exists at all — DuckDB can replay md5 but not xxhash64. At 100 TB
  // run THIS path. ----

  /** Non-distinct unigram+bigram buckets in [0, b). */
  def featuresFast(text: Column, b: Int): Column =
    graft.functions.DsirBuckets.native(text, b)

  /** One-scan learn when the target is a predicate over the raw
    * corpus (the common curation case): both histograms come from a
    * single explode + b-bounded agg with a conditional count. Returns
    * the dense per-bucket ratio array (index = bucket id) — no
    * default needed, the array covers the whole space.
    */
  def logRatiosMicroFast(raw: DataFrame, targetPred: Column,
      textCol: String, b: Int): Array[Long] = {
    val ex = raw.select(explode(featuresFast(col(textCol), b)).as("bucket"),
      targetPred.as("__t"))
    val rows = ex.groupBy("bucket").agg(
      count(lit(1)).cast("long").as("cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).cast("long").as("ct"))
      .collect()
    val ct = new Array[Long](b)
    val cr = new Array[Long](b)
    rows.foreach { r =>
      val k = r.getInt(0); cr(k) = r.getLong(1); ct(k) = r.getLong(2)
    }
    val tt = ct.sum
    val tr = cr.sum
    Array.tabulate(b)(k => math.floor(math.log(
      ((ct(k) + 1).toDouble / (tt + b)) / ((cr(k) + 1).toDouble / (tr + b)))
      * 1e6 + 0.5).toLong)
  }

  /** Fast per-doc weights: broadcast dense array, O(1) indexed lookup
    * per feature, one shuffle-free scan.
    */
  def docLogWeightsMicroFast(df: DataFrame, idCol: String, textCol: String,
      ratios: Array[Long], b: Int): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(ratios)
    val sumR = udf { fs: Seq[Int] =>
      var s = 0L; val it = fs.iterator
      while (it.hasNext) s += bc.value(it.next())
      s
    }
    df.select(col(idCol),
      sumR(featuresFast(col(textCol), b)).as("log_w_micro"))
  }

  /** End-to-end fast form: one learn scan + one score scan. */
  def dsirWeightsFast(raw: DataFrame, idCol: String, textCol: String,
      targetPred: Column, b: Int): DataFrame =
    docLogWeightsMicroFast(raw, idCol, textCol,
      logRatiosMicroFast(raw, targetPred, textCol, b), b)
}
