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
      var s = 0L; val it = ws.iterator
      while (it.hasNext) s += bc.value.getOrElse(it.next(), oovMicro)
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
