package graft

import org.apache.spark.sql.functions._

import graft.text.LmScore

/** Interpolated Kneser-Ney bigram LM: model construction identities,
  * the continuation-probability signature that distinguishes KN from
  * frequency smoothing, ARPA-backoff scoring plumbing (edge docs,
  * pruned pairs), and determinism.
  */
class KnLmSpec extends SparkSpecBase {

  private def docsDf(texts: Seq[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t2, i) => (i.toLong, t2) }.toDF("doc_id", "text")
  }

  test("model identities: mass bound, seen-pair cost below backoff cost") {
    val docs = docsDf(Seq(
      "the cat sat on the mat", "the dog sat on the rug",
      "a cat and a dog", "the cat saw the dog"))
    val m = LmScore.knBigramLmMicro(docs, "text", 4096)
    assert(m.pairMicro.nonEmpty && m.lambdaMicro.nonEmpty)
    // all costs are positive micro-nats (every probability < 1)
    (m.pairMicro.values ++ m.lambdaMicro.values ++ m.contMicro.values)
      .foreach(v => assert(v > 0))
    // per-context probability mass: seen-pair mass + full backoff mass
    // (lambda * sum over ALL continuations incl. add-one tail) <= 1
    val contSum = m.contMicro.values.map(v => math.exp(-v / 1e6)).sum
    m.lambdaMicro.foreach { case (w1, lamMicro) =>
      val lam = math.exp(-lamMicro / 1e6)
      val seen = m.pairMicro.collect {
        case ((a, _), v) if a == w1 => math.exp(-v / 1e6)
      }.sum
      // seen pairs already INCLUDE their lambda*pcont interpolation
      // term, so the bound is seen + lambda*(unseen cont tail) <= 1
      assert(seen <= 1.0 + 1e-6, s"$w1 seen mass $seen")
      assert(seen + lam * math.max(0.0, 1.0 - contSum) <= 1.0 + 1e-4,
        s"$w1 mass bound")
    }
    // the most frequent observed pair is cheaper than scoring it via
    // the backoff path would be
    val ((w1, w2), best) = m.pairMicro.minBy(_._2)
    val backoff = m.lambdaMicro(w1) + m.contMicro.getOrElse(w2, m.oovContMicro)
    assert(best < backoff, s"($w1,$w2): $best !< $backoff")
  }

  test("KN signature: diverse-context word beats single-context word of equal frequency") {
    // 'york' occurs 6x but ONLY after 'new'; 'runs' occurs 6x after 6
    // different words. Raw frequency is equal; KN continuation prob
    // must make 'runs' the cheaper novel-context continuation.
    val docs = docsDf(Seq(
      "new york new york new york new york new york new york",
      "he runs she runs it runs dog runs cat runs fox runs"))
    val m = LmScore.knBigramLmMicro(docs, "text", 4096)
    assert(m.contMicro("runs") < m.contMicro("york"),
      s"runs=${m.contMicro("runs")} york=${m.contMicro("york")}")
  }

  test("scoring: ARPA backoff sum replayed by hand; empty and 1-word docs score 0") {
    val corpus = docsDf(Seq(
      "alpha beta gamma alpha beta", "beta gamma delta", "zeta", ""))
    val m = LmScore.knBigramLmMicro(corpus, "text", 4096)
    val got = LmScore.docKnPerplexityMicro(corpus, "doc_id", "text", m)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def cost(w1: String, w2: String): Long =
      m.pairMicro.getOrElse((w1, w2),
        m.lambdaMicro.getOrElse(w1, 0L) +
          m.contMicro.getOrElse(w2, m.oovContMicro))
    val d0 = Seq("alpha" -> "beta", "beta" -> "gamma", "gamma" -> "alpha",
      "alpha" -> "beta").map { case (a, b) => cost(a, b) }.sum
    assert(got(0) == ((0L, 4L, d0, math.floor(d0.toDouble / 4 + 0.5).toLong)))
    assert(got(2) == ((2L, 0L, 0L, 0L))) // 1 word: no transitions
    assert(got(3) == ((3L, 0L, 0L, 0L))) // empty
    // null text scores 0 like an empty doc (no NPE in the scoring udf)
    val withNull = docsDf(Seq("alpha beta")).unionByName(
      spark.sql("SELECT CAST(9 AS BIGINT) doc_id, CAST(NULL AS STRING) text"))
    val nr = LmScore.docKnPerplexityMicro(withNull, "doc_id", "text", m)
      .where(col("doc_id") === 9).collect()(0)
    assert(nr.getLong(1) == 0L && nr.getLong(2) == 0L && nr.getLong(3) == 0L)
    // a never-seen bigram of a known context and known continuation
    // costs lambda + cont exactly
    assert(!m.pairMicro.contains(("gamma", "beta")))
    val novel = docsDf(Seq("gamma beta"))
    val sc = LmScore.docKnPerplexityMicro(novel, "doc_id", "text", m)
      .collect()(0).getLong(2)
    assert(sc == m.lambdaMicro("gamma") + m.contMicro("beta"))
  }

  test("pruning keeps the model bounded; pruned pairs score via backoff") {
    val docs = docsDf((0 until 50).map(i => s"w$i x$i w$i y$i common tail"))
    val full = LmScore.knBigramLmMicro(docs, "text", 4096)
    val pruned = LmScore.knBigramLmMicro(docs, "text", 8)
    assert(pruned.pairMicro.size == 8 && full.pairMicro.size > 8)
    // scoring never throws on pruned-away pairs and yields finite sums
    val scored = LmScore.docKnPerplexityMicro(docs, "doc_id", "text", pruned)
      .agg(sum("nll_micro")).collect()(0).getLong(0)
    assert(scored > 0)
    // determinism: identical rebuild
    val again = LmScore.knBigramLmMicro(docs, "text", 8)
    assert(again == pruned)
  }
}
