package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016) — the
  * stage that turns the curated raw corpus into the pre-tokenized
  * `tokens: array<int>` table the columnar encode pipeline consumes
  * ([[graft.model.TokenRow]] / `input_hint` shape). Closes the loop:
  * raw text → quality gates → dedup → BPE → [[graft.encode.TokenEncoder]].
  *
  * Scale shape (the SentencePiece/HF-tokenizers recipe, re-expressed
  * Spark-first):
  *  1. ONE distributed word-frequency aggregate (map-side combined
  *     groupBy on the whitespace-split words), cut to the top
  *     `maxWords` by (count desc, word asc) — orderBy+limit compiles
  *     to TakeOrdered, no global sort. The heavy-tail cut is the
  *     standard trade: the histogram carries the probability mass,
  *     and apply-time words outside it still encode exactly via their
  *     characters + learned merges (nothing is dropped — ONLY the
  *     merge-count statistics come from the top slice).
  *  2. A driver-side merge loop over that bounded histogram — pair
  *     counts are weighted by word frequency and updated
  *     incrementally (only words containing the merged pair are
  *     touched, via a pair→words inverted index), so training cost is
  *     O(maxWords·avgLen + merges·touched), independent of corpus
  *     size. This is deliberately NOT distributed: after step 1 the
  *     problem is KB-sized; a per-merge Spark job would be pure
  *     scheduler overhead (the same collect-bounded pattern as
  *     [[Dsir.logRatiosMicro]] / IVF centroids).
  *  3. Encode/decode = shuffle-free scans with the model broadcast
  *     once per executor: greedy lowest-rank merge apply per word,
  *     O(1) hash probes.
  *
  * Determinism: merge selection breaks count ties on the
  * lexicographically smallest (left, right); vocab ids are assigned
  * UNK, then the sorted initial alphabet, then merge outputs in merge
  * order — identical corpora give identical models on any cluster
  * layout. Unknown apply-time CHARACTERS (not words) map to UNK; a
  * round trip is exact whenever the alphabet covers the input, which
  * the corpus-trained oracle query relies on.
  */
object Bpe {

  /** End-of-word sentinel symbol (Sennrich's `</w>` role): makes the
    * word boundary a first-class symbol so merges can learn suffixes,
    * and decode knows where to restore spaces. A PRIVATE-USE code
    * point rather than the literal `</w>` — web text contains the
    * four-char string `</w>` often enough that a merge could forge a
    * fake word boundary; U+E000 appearing in a real document is the
    * documented residual collision (same residual SentencePiece
    * accepts for U+2581).
    */
  val Eow = "\uE000"
  val Unk = "<unk>"

  final case class Model(vocab: Map[String, Int],
                         merges: Vector[(String, String)]) {
    /** (left, right) → merge priority (lower merges first). */
    @transient lazy val rank: Map[(String, String), Int] =
      merges.iterator.zipWithIndex.toMap
    @transient lazy val inverse: Array[String] = {
      val a = new Array[String](vocab.size)
      vocab.foreach { case (s, i) => a(i) = s }
      a
    }
    def unkId: Int = vocab(Unk)
  }

  private def words(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= lit(""))

  /** Code-point symbols (a surrogate pair is ONE symbol — consistent
    * with Spark's split(str, '') and with decode's concat).
    */
  private def syms(w: String): Iterator[String] = {
    val it = w.codePoints().iterator()
    new Iterator[String] {
      def hasNext: Boolean = it.hasNext
      def next(): String = new String(Character.toChars(it.next()))
    }
  }

  /** The corpus alphabet — a bounded distinct aggregate over single
    * code points (map-side combine collapses each partition to its
    * alphabet before the exchange). Passed to [[train]] so apply-time
    * words OUTSIDE the histogram cut still encode exactly: UNK is
    * reserved for characters the corpus never contained at all.
    */
  def alphabetOf(df: DataFrame, textCol: String): Set[String] =
    df.select(explode(split(col(textCol), "")).as("c"))
      .where(col("c").rlike("\\S")).distinct()
      .collect().map(_.getString(0)).toSet

  /** Step 1: the distributed word histogram, deterministically cut. */
  def wordHistogram(df: DataFrame, textCol: String,
      maxWords: Int): Array[(String, Long)] =
    df.select(explode(words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Step 2: the classic frequency-weighted merge loop with
    * incremental pair-count maintenance.
    */
  def train(hist: Seq[(String, Long)], numMerges: Int,
      alphabet: Set[String] = Set.empty): Model = {
    // each histogram word as a mutable symbol buffer + its frequency
    val seqs = hist.iterator.map { case (w, n) =>
      val b = mutable.ArrayBuffer[String]()
      syms(w).foreach(b += _)
      b += Eow
      (b, n)
    }.toArray
    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.BitSet]()
    def addPairs(wi: Int, sign: Long): Unit = {
      val (b, n) = seqs(wi)
      var i = 0
      while (i < b.length - 1) {
        val p = (b(i), b(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * n
        if (c == 0L) { pairCount.remove(p); () } else pairCount(p) = c
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    seqs.indices.foreach(addPairs(_, 1L))
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      if (pairCount.isEmpty) done = true
      else {
        // max count, ties broken on the smallest (left, right)
        var best: (String, String) = null
        var bestN = 0L
        pairCount.foreach { case (p, n) =>
          if (n > bestN || (n == bestN && (best == null ||
              Ordering[(String, String)].lt(p, best)))) {
            best = p; bestN = n
          }
        }
        if (bestN < 2) done = true // nothing left worth merging
        else {
          merges += best
          val joined = best._1 + best._2
          val touched = pairWords.getOrElse(best, mutable.BitSet.empty).toArray
          touched.foreach { wi =>
            val (b, _) = seqs(wi)
            addPairs(wi, -1L)
            var i = 0
            while (i < b.length - 1) {
              if (b(i) == best._1 && b(i + 1) == best._2) {
                b(i) = joined; b.remove(i + 1); ()
              } else i += 1
            }
            addPairs(wi, 1L)
          }
          pairCount.remove(best)
          pairWords.remove(best)
          m += 1
        }
      }
    }
    val ms = merges.result()
    // deterministic vocab: UNK, sorted initial alphabet (histogram
    // symbols ∪ the supplied corpus alphabet ∪ Eow), then merge
    // outputs in merge order
    val alpha = mutable.SortedSet[String]()
    hist.foreach { case (w, _) => syms(w).foreach(alpha += _) }
    alphabet.foreach(alpha += _)
    alpha += Eow
    val vocab = mutable.LinkedHashMap[String, Int](Unk -> 0)
    alpha.foreach(s => vocab.getOrElseUpdate(s, vocab.size))
    ms.foreach { case (l, r) => vocab.getOrElseUpdate(l + r, vocab.size) }
    Model(vocab.toMap, ms)
  }

  /** Steps 1+2 fused: train a model from a corpus column (histogram
    * statistics from the top slice, alphabet from the whole corpus).
    */
  def trainOn(df: DataFrame, textCol: String, maxWords: Int,
      numMerges: Int): Model =
    train(wordHistogram(df, textCol, maxWords).toSeq, numMerges,
      alphabetOf(df, textCol))

  /** Greedy merge apply for one word: repeatedly contract the
    * present pair with the lowest merge rank. O(L²) worst case with
    * tiny constants — words are short; the broadcast probes are O(1).
    */
  def encodeWord(word: String, model: Model): Array[Int] = {
    val b = mutable.ArrayBuffer[String]()
    syms(word).foreach(b += _)
    b += Eow
    var continue = true
    while (continue && b.length > 1) {
      var bestI = -1
      var bestR = Int.MaxValue
      var i = 0
      while (i < b.length - 1) {
        model.rank.get((b(i), b(i + 1))).foreach { r =>
          if (r < bestR) { bestR = r; bestI = i }
        }
        i += 1
      }
      if (bestI < 0) continue = false
      else {
        b(bestI) = b(bestI) + b(bestI + 1)
        b.remove(bestI + 1)
        ()
      }
    }
    b.iterator.map(s => model.vocab.getOrElse(s, model.unkId)).toArray
  }

  /** Corpus encode: one shuffle-free scan, model broadcast once.
    * Output keeps the id column plus `tokens` / `n_tokens`.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    // per-task word→tokens memo (r7): corpora are Zipf-distributed, so
    // the greedy merge loop re-ran for the same frequent words
    // thousands of times per partition. The cache lives in a
    // @transient lazy val, so each task deserialization starts fresh
    // (no cross-query or cross-run state) and the entry cap bounds
    // memory on adversarial vocabularies. Results are identical —
    // encodeWord is a pure function of (word, model).
    val enc = udf(new (String => Array[Int]) with Serializable {
      @transient private lazy val cache =
        new java.util.HashMap[String, Array[Int]](1 << 12)
      private val MaxEntries = 1 << 16
      def apply(text: String): Array[Int] = {
        if (text == null) return Array.emptyIntArray
        val out = mutable.ArrayBuilder.make[Int]
        text.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
          var toks = cache.get(w)
          if (toks == null) {
            toks = encodeWord(w, bc.value)
            if (cache.size < MaxEntries) cache.put(w, toks)
          }
          out ++= toks
        }
        out.result()
      }
    })
    df.select(col(idCol), enc(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Symmetric decode: ids → symbols, spaces restored at `Eow`.
    * Exact inverse of [[encode]] up to whitespace normalization
    * whenever no UNK was emitted.
    */
  def decode(df: DataFrame, idCol: String, tokensCol: String,
      model: Model): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val dec = udf { tokens: Seq[Int] =>
      val inv = bc.value.inverse
      val sb = new StringBuilder
      var first = true
      var cur = new StringBuilder
      tokens.foreach { id =>
        val s = if (id >= 0 && id < inv.length) inv(id) else Unk
        if (s.endsWith(Eow)) {
          cur.append(s.stripSuffix(Eow))
          if (!first) sb.append(' ')
          sb.append(cur)
          cur = new StringBuilder
          first = false
        } else cur.append(s)
      }
      if (cur.nonEmpty) { // trailing partial word (no Eow): keep it
        if (!first) sb.append(' ')
        sb.append(cur)
      }
      sb.toString
    }
    df.select(col(idCol), dec(col(tokensCol)).as("text_rt"))
  }

  /** Adapter into the columnar-encode pipeline: the `input_hint`
    * table shape (doc_id:string, tokens:array<int>, n_tok:int,
    * source:string) ready for [[graft.encode.TokenEncoder]].
    */
  def tokenTable(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, model: Model): DataFrame = {
    val enc = encode(df, idCol, textCol, model)
    df.select(col(idCol), col(sourceCol))
      .join(enc, Seq(idCol))
      .select(col(idCol).cast("string").as("doc_id"), col("tokens"),
        col("n_tokens").cast("int").as("n_tok"),
        col(sourceCol).as("source"))
  }
}
