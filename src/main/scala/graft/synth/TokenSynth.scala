package graft.synth

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.TokenRow

/** Deterministic synthetic token table (BASELINE.json `input_hint`,
  * FIXTURES.md §C): (doc_id, tokens, n_tok, source) with zipf-skewed
  * sources, one token regime per source so every codec's trigger space
  * is exercised, and fixed edge rows.
  *
  * Determinism is per-row, keyed on the global row id via a splitmix64
  * mix — the generated table is identical regardless of parallelism or
  * partitioning, which the local[8]-vs-local[32] scaling bench relies
  * on.
  */
object TokenSynth {

  /** (name, cumulative probability, regime) — zipf-ish skew: `web`
    * dominates, forcing the salting path in partition assignment.
    */
  val sources: Array[(String, Double, String)] = Array(
    ("web", 0.40, "phrases"),
    ("books", 0.55, "runs"),
    ("code", 0.67, "smallvals"),
    ("wiki", 0.77, "narrow"),
    ("news", 0.85, "lowcard"),
    ("logs", 0.92, "smooth"),
    ("social", 0.97, "random"),
    ("arxiv", 1.00, "mixed")
  )

  private def mix(z0: Long): Long = graft.codec.Hash.splitmix64(z0)

  def row(id: Long, seed: Long): TokenRow = {
    val rng = new scala.util.Random(mix(seed ^ id))
    val u = rng.nextDouble()
    var si = 0
    while (u > sources(si)._2) si += 1
    val (src, _, regime) = sources(si)
    val docId = f"$src%s-$id%012d"
    // long-tailed length: mostly short, tail to 8192
    val baseLen = (math.exp(rng.nextGaussian() * 1.1 + 4.7)).toInt
    val len0 = math.min(math.max(baseLen, 1), 8192)
    val edge = id % 10007
    val tokens: Array[Int] =
      if (edge == 0L) Array.emptyIntArray
      else if (edge == 1L) Array(rng.nextInt(1 << 16))
      else if (edge == 2L) { val a = gen(regime, len0, rng); if (a.nonEmpty) a(a.length / 2) = Int.MaxValue; a }
      else if (edge == 3L) Array.fill(len0)(7)
      else gen(regime, len0, rng)
    TokenRow(docId, tokens, tokens.length, src)
  }

  private def gen(regime: String, len: Int, rng: scala.util.Random): Array[Int] =
    regime match {
      case "phrases" =>
        // repeated 3-8-token subsequences over a mid vocab
        val nPhrases = 64
        val out = new Array[Int](len)
        var i = 0
        while (i < len) {
          val pid = rng.nextInt(nPhrases)
          val plen = 3 + (pid % 6)
          val prng = new scala.util.Random(mix(0xF00DL ^ pid.toLong))
          var k = 0
          while (k < plen && i < len) { out(i) = prng.nextInt(30000); i += 1; k += 1 }
        }
        out
      case "runs" =>
        val out = new Array[Int](len)
        var i = 0
        while (i < len) {
          val v = rng.nextInt(64)
          val run = 10 + rng.nextInt(991)
          var k = 0
          while (k < run && i < len) { out(i) = v; i += 1; k += 1 }
        }
        out
      case "smallvals" =>
        val k = 4 + 4 * rng.nextInt(3) // 4, 8, 12 bits
        Array.fill(len)(rng.nextInt(1 << k))
      case "narrow" =>
        val base = 1 << 27
        Array.fill(len)(base + rng.nextInt(1 << 12))
      case "lowcard" =>
        val vocab = Array.tabulate(100)(i => (mix(0xCAFEL ^ i.toLong) & 0xFFFFF).toInt)
        Array.fill(len)(vocab(rng.nextInt(vocab.length)))
      case "smooth" =>
        // monotone-ish positional stream: small positive deltas
        val out = new Array[Int](len)
        var v = rng.nextInt(1000)
        var i = 0
        while (i < len) { out(i) = v; v += rng.nextInt(16); i += 1 }
        out
      case "random" =>
        Array.fill(len)(rng.nextInt(Int.MaxValue))
      case _ => // boilerplate: FEW repeated phrases — few enough
        // distinct subsequences for a 255-symbol FSST table to cover
        // nearly all mass, where dict+zstd still pays per-token width
        val nPhrases = 30
        val out = new Array[Int](len)
        var i = 0
        while (i < len) {
          val pid = rng.nextInt(nPhrases)
          val plen = 3 + (pid % 6)
          val prng = new scala.util.Random(mix(0xBEEFL ^ pid.toLong))
          var k = 0
          while (k < plen && i < len) { out(i) = prng.nextInt(30000); i += 1; k += 1 }
        }
        out
    }

  def dataset(spark: SparkSession, nRows: Long, seed: Long = 42L,
              parallelism: Int = 0): Dataset[TokenRow] = {
    import spark.implicits._
    val p = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.range(0L, nRows, 1L, p).map(id => row(id, seed))
  }
}
