package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Language-model quality scoring, CCNet-style (Wenzek et al. 2019
  * §4.2 filter docs by LM perplexity; RefinedWeb and most open
  * curation stacks keep a variant of this gate). The sandbox has no
  * KenLM, so the model is an honest from-scratch unigram LM — the
  * same learn-on-corpus / score-every-doc shape, swap-in-able for a
  * higher-order model where one exists.
  *
  * Scale shape mirrors the rank-vocab tokenizer: the model is a top-V
  * word table (one map-side-combined count agg + a V-row TakeOrdered
  * collect), shipped ONCE per executor as a Spark broadcast, consulted
  * by one O(1)-per-word udf — scoring is a single shuffle-free scan of
  * the corpus. All probabilities live on the integer micro-nat
  * lattice (floor(-ln p · 1e6 + 0.5)), so per-doc sums are exact
  * BIGINTs and the DuckDB oracle reproduces every value bit-for-bit.
  */
object LmScore {

  /** Learn a top-`vocabSize` unigram LM with add-one smoothing and a
    * single OOV symbol: p(w) = (c(w)+1)/(T+V+1), p(oov) = 1/(T+V+1),
    * where T = total in-vocab token count, V = vocab size actually
    * kept. Returns (word -> -ln p in micro-nats, OOV micro-nats).
    * Vocab cut ties break on (count desc, word asc) — deterministic
    * and replayable in SQL.
    */
  def unigramLmMicro(docs: DataFrame, textCol: String,
      vocabSize: Int): (Map[String, Long], Long) = {
    val counts = docs
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        w => w =!= lit(""))).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val t = counts.map(_._2).sum
    val v = counts.length
    def nll(c: Long): Long =
      math.floor(-math.log((c + 1).toDouble / (t + v + 1)) * 1e6 + 0.5).toLong
    (counts.map { case (w, c) => w -> nll(c) }.toMap, nll(0L))
  }

  /** Interpolated Kneser-Ney bigram LM (Chen & Goodman 1998's
    * recommended smoothing; the model family behind KenLM's ARPA
    * files, which is what CCNet actually scores with). Everything
    * derives from ONE distributed bigram-count aggregation cut to the
    * top-`maxPairs` pairs (count desc, pair asc — deterministic), the
    * pruned-ARPA shape: discounts, context and continuation statistics
    * are computed over the KEPT pair table, so the model is
    * self-consistent by construction and its driver-side footprint is
    * bounded at any corpus size.
    *
    *  - p(w2|w1)   = (c(w1,w2) - D)/c(w1) + lambda(w1) * pcont'(w2)
    *  - lambda(w1) = D * N1+(w1*) / c(w1)        (backoff mass)
    *  - pcont'(w2) = (N1+(*w2) + 1)/(P + V + 1)  (add-one continuation)
    *  - D          = n1/(n1 + 2*n2)              (count-of-counts)
    *
    * Scoring is ARPA backoff arithmetic on the micro-nat lattice:
    * a SEEN pair costs its own micro-nat entry; an unseen pair costs
    * lambdaMicro(w1) + contMicro(w2) (0 / oovContMicro when the
    * context / word is unknown) — pure BIGINT sums, so the DuckDB
    * oracle reproduces every doc score exactly after recomputing the
    * identical model in SQL.
    */
  final case class KnBigramModel(
      pairMicro: Map[(String, String), Long],
      lambdaMicro: Map[String, Long],
      contMicro: Map[String, Long],
      oovContMicro: Long)

  def knBigramLmMicro(docs: DataFrame, textCol: String,
      maxPairs: Int): KnBigramModel = {
    val ws = filter(split(lower(col(textCol)), "\\s+"), w => w =!= lit(""))
    val pairs = docs
      .select(ws.as("__ws"))
      // filter BEFORE building the index sequence: sequence(0, -1)
      // would DESCEND for 1-word docs and index element 0
      .where(size(col("__ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__ws")) - 2),
        i => struct(element_at(col("__ws"), i + 1).as("w1"),
          element_at(col("__ws"), i + 2).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(maxPairs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val (pairMicro, lambdaMicro, contMicro, oovCont) = knTermsMicro(pairs)
    KnBigramModel(pairMicro, lambdaMicro, contMicro, oovCont)
  }

  /** The KN smoothing math, defined ONCE and generic in the token
    * key: the raw-text model above (String words) and
    * CompressedSearch.storeKnPerplexity's store-trained gate (Int
    * tokens) both call this, so the discount / backoff / continuation
    * formulas cannot drift between the two oracles. Formula order is
    * frozen — both DuckDB oracles replay the double arithmetic
    * bit-for-bit. Returns (pair, lambda, continuation, oovCont) NLL
    * terms in micro-nats; an empty pair table yields empty maps and
    * oovCont 0.
    */
  def knTermsMicro[K](pairs: Array[(K, K, Long)])
      : (Map[(K, K), Long], Map[K, Long], Map[K, Long], Long) = {
    if (pairs.isEmpty) return (Map.empty, Map.empty, Map.empty, 0L)
    val ctx = pairs.groupBy(_._1).map { case (w1, ps) =>
      w1 -> (ps.map(_._3).sum, ps.length.toLong) // (c(w1), N1+(w1*))
    }
    val cont = pairs.groupBy(_._2).map { case (w2, ps) =>
      w2 -> ps.length.toLong // N1+(*w2)
    }
    val nPairs = pairs.length.toLong
    val vCont = cont.size.toLong
    val n1 = pairs.count(_._3 == 1L).toLong
    val n2 = pairs.count(_._3 == 2L).toLong
    // degenerate corpora (no singletons) fall back to the textbook 0.5
    val d = if (n1 == 0) 0.5 else n1.toDouble / (n1 + 2 * n2)
    def micro(p: Double): Long = math.floor(-math.log(p) * 1e6 + 0.5).toLong
    // formula order mirrors the oracle SQL term-for-term so the
    // double arithmetic is bit-identical
    val pairMicro = pairs.map { case (w1, w2, c) =>
      val (cw1, n1p) = ctx(w1)
      val p = (c.toDouble - d) / cw1 +
        ((d * n1p) / cw1) * ((cont(w2).toDouble + 1) / (nPairs + vCont + 1))
      (w1, w2) -> micro(p)
    }.toMap
    val lambdaMicro = ctx.map { case (w1, (cw1, n1p)) =>
      w1 -> micro((d * n1p) / cw1)
    }
    val contMicro = cont.map { case (w2, nc) =>
      w2 -> micro((nc.toDouble + 1) / (nPairs + vCont + 1))
    }
    (pairMicro, lambdaMicro, contMicro, micro(1.0 / (nPairs + vCont + 1)))
  }

  /** Per-document KN-bigram score: one shuffle-free scan, model
    * broadcast once. `n_bigrams` = word count - 1; docs with fewer
    * than 2 words score 0 (no transitions to evaluate).
    */
  def docKnPerplexityMicro(docs: DataFrame, idCol: String, textCol: String,
      model: KnBigramModel): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val sumNll = udf { ws: Seq[String] =>
      val m = bc.value
      var s = 0L
      var i = 1
      // null text -> null word array -> score 0, like an empty doc
      while (ws != null && i < ws.length) {
        val w1 = ws(i - 1); val w2 = ws(i)
        s += m.pairMicro.getOrElse((w1, w2),
          m.lambdaMicro.getOrElse(w1, 0L) +
            m.contMicro.getOrElse(w2, m.oovContMicro))
        i += 1
      }
      s
    }
    val ws = filter(split(lower(col(textCol)), "\\s+"), w => w =!= lit(""))
    docs
      .select(col(idCol),
        greatest(size(ws).cast("long") - 1, lit(0L)).as("n_bigrams"),
        sumNll(ws).as("nll_micro"))
      .withColumn("ppl_micro",
        when(col("n_bigrams") === 0, lit(0L))
          .otherwise(floor(col("nll_micro").cast("double") / col("n_bigrams")
            + 0.5).cast("long")))
  }

  /** Per-document LM score: total and mean negative log-likelihood in
    * micro-nats (mean NLL is log-perplexity — filter on `ppl_micro`
    * exactly as CCNet buckets head/middle/tail). Empty docs score 0.
    * One scan; the model broadcast is the only non-codegen step (a
    * map LITERAL would be a linear probe per word — GetMapValue has
    * no hash index; same trade as TextOps.tokenize).
    */
  def docPerplexityMicro(docs: DataFrame, idCol: String, textCol: String,
      model: Map[String, Long], oovMicro: Long): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val sumNll = udf { ws: Seq[String] =>
      var s = 0L
      // null text -> null word array -> score 0, like an empty doc
      if (ws != null) {
        val it = ws.iterator
        while (it.hasNext) s += bc.value.getOrElse(it.next(), oovMicro)
      }
      s
    }
    val ws = filter(split(lower(col(textCol)), "\\s+"), w => w =!= lit(""))
    docs
      .select(col(idCol), size(ws).cast("long").as("n_words"),
        sumNll(ws).as("nll_micro"))
      .withColumn("ppl_micro",
        when(col("n_words") === 0, lit(0L))
          .otherwise(floor(col("nll_micro").cast("double") / col("n_words")
            + 0.5).cast("long")))
  }
}
