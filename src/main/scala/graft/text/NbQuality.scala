package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-n-gram quality classifier — the GPT-3/LLaMA/CCNet curation
  * stage that DSIR does not cover: given a LABELED corpus (a "looks
  * like the reference corpus" positive class vs a random-crawl
  * negative class), learn a two-class multinomial Naive Bayes model
  * over hashed unigram+bigram buckets and score every document with
  * its log posterior odds. fastText's supervised classifier collapses
  * to exactly this shape when the embedding dimension is the bucket
  * count and the loss is generative — the distributed-NB form needs
  * no gradient steps: both class histograms come from ONE conditional
  * count aggregate.
  *
  * Relation to [[Dsir]]: DSIR scores p_target/p_raw for importance
  * RESAMPLING (the target is a subset of raw); the classifier scores
  * p(f|pos)/p(f|neg) between two DISJOINT classes plus a doc-count
  * prior, and thresholds at 0 for a keep/drop decision. The lattice
  * discipline is shared: every ratio lives on an integer micro-nat
  * grid (floor(ln·1e6+0.5)) so per-doc sums are exact BIGINTs and the
  * DuckDB oracle reproduces them bit-for-bit.
  *
  * Spark-first scale shape (the 100-TB path is the `*Fast` pair):
  *  - learn: one explode + B-bounded conditional-count aggregate
  *    (map-side combined; the collect is ≤B rows) + one 2-row doc-
  *    count aggregate for the prior;
  *  - score: ONE shuffle-free scan — features from the native one-
  *    pass [[graft.functions.DsirBuckets]] kernel, ratios broadcast
  *    as a dense Array[Long] with O(1) indexed lookup;
  *  - the md5 portable form exists so the oracle can replay the
  *    hashing (DuckDB has md5, not xxhash64).
  */
object NbQuality {

  /** Learned model: per-bucket log-likelihood ratios in micro-nats,
    * the never-seen-bucket default, and the log prior odds.
    */
  final case class Model(ratios: Map[String, Long], defaultMicro: Long,
                         priorMicro: Long)

  /** Train on a labeled frame: `posPred` marks the positive class
    * (null ⇒ negative). Add-one smoothing over the full 16^hexChars
    * bucket space; prior = ln((nPosDocs+1)/(nNegDocs+1)).
    */
  def trainMicro(labeled: DataFrame, posPred: Column, textCol: String,
      hexChars: Int): Model = {
    require(hexChars >= 1 && hexChars <= 4,
      s"hexChars must be in [1,4] (bucket space 16..65536), got $hexChars")
    val b = math.pow(16.0, hexChars).toLong
    val isPos = coalesce(posPred, lit(false))
    val rows = labeled
      .select(explode(Dsir.features(col(textCol), hexChars)).as("bucket"),
        isPos.as("__p"))
      .groupBy("bucket").agg(
        sum(when(col("__p"), lit(1L)).otherwise(lit(0L))).cast("long").as("cp"),
        sum(when(col("__p"), lit(0L)).otherwise(lit(1L))).cast("long").as("cn"))
      .collect()
    val cp = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val cn = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val tp = cp.values.sum
    val tn = cn.values.sum
    val d = labeled.agg(
      sum(when(isPos, lit(1L)).otherwise(lit(0L))).cast("long"),
      sum(when(isPos, lit(0L)).otherwise(lit(1L))).cast("long")).collect()(0)
    val (nPos, nNeg) = (d.getLong(0), d.getLong(1))
    // floor(x+0.5) on BOTH engines — see Dsir.logRatiosMicro
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    def ratio(p: Long, n: Long): Long = micro(math.log(
      ((p + 1).toDouble / (tp + b)) / ((n + 1).toDouble / (tn + b))))
    Model(
      rows.map(_.getString(0)).iterator
        .map(k => k -> ratio(cp(k), cn(k))).toMap,
      ratio(0L, 0L),
      micro(math.log((nPos + 1).toDouble / (nNeg + 1).toDouble)))
  }

  /** Score every document: `score_micro` = prior + Σ per-feature
    * log-likelihood ratios (empty text scores the bare prior),
    * `nb_pos` = score > 0. One shuffle-free scan; the ratio table is
    * a broadcast consulted by an O(1) map probe (a map LITERAL would
    * be a linear scan per feature — GetMapValue has no hash index).
    */
  def score(df: DataFrame, idCol: String, textCol: String, model: Model,
      hexChars: Int): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      (model.ratios, model.defaultMicro, model.priorMicro))
    val sc = udf { fs: Seq[String] =>
      val (m, dflt, prior) = bc.value
      var s = prior; val it = fs.iterator
      while (it.hasNext) s += m.getOrElse(it.next(), dflt)
      s
    }
    df.select(col(idCol),
        sc(Dsir.features(col(textCol), hexChars)).as("score_micro"))
      .withColumn("nb_pos", col("score_micro") > 0)
  }

  // ---- fast path: xxhash64 buckets via the native one-pass kernel.
  // Same algorithm; hash differs from the md5 portable form (bucket
  // collisions differ slightly) — at 100 TB run THIS pair. ----

  /** One-scan fast train: dense per-bucket ratio array + prior. */
  def trainMicroFast(labeled: DataFrame, posPred: Column, textCol: String,
      b: Int): (Array[Long], Long) = {
    val isPos = coalesce(posPred, lit(false))
    val rows = labeled
      .select(explode(Dsir.featuresFast(col(textCol), b)).as("bucket"),
        isPos.as("__p"))
      .groupBy("bucket").agg(
        sum(when(col("__p"), lit(1L)).otherwise(lit(0L))).cast("long").as("cp"),
        sum(when(col("__p"), lit(0L)).otherwise(lit(1L))).cast("long").as("cn"))
      .collect()
    val cp = new Array[Long](b)
    val cn = new Array[Long](b)
    rows.foreach { r =>
      val k = r.getInt(0); cp(k) = r.getLong(1); cn(k) = r.getLong(2)
    }
    val tp = cp.sum
    val tn = cn.sum
    val d = labeled.agg(
      sum(when(isPos, lit(1L)).otherwise(lit(0L))).cast("long"),
      sum(when(isPos, lit(0L)).otherwise(lit(1L))).cast("long")).collect()(0)
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    (Array.tabulate(b)(k => micro(math.log(
      ((cp(k) + 1).toDouble / (tp + b)) / ((cn(k) + 1).toDouble / (tn + b))))),
      micro(math.log((d.getLong(0) + 1).toDouble / (d.getLong(1) + 1).toDouble)))
  }

  /** Fast score: native bucket kernel + dense-array broadcast. */
  def scoreFast(df: DataFrame, idCol: String, textCol: String,
      ratios: Array[Long], priorMicro: Long, b: Int): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(ratios)
    val sc = udf { fs: Seq[Int] =>
      var s = priorMicro; val it = fs.iterator
      while (it.hasNext) s += bc.value(it.next())
      s
    }
    df.select(col(idCol),
        sc(Dsir.featuresFast(col(textCol), b)).as("score_micro"))
      .withColumn("nb_pos", col("score_micro") > 0)
  }

  /** End-to-end fast form: one learn scan + one score scan. */
  def classifyFast(labeled: DataFrame, idCol: String, textCol: String,
      posPred: Column, b: Int): DataFrame = {
    val (ratios, prior) = trainMicroFast(labeled, posPred, textCol, b)
    scoreFast(labeled, idCol, textCol, ratios, prior, b)
  }
}
