package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token
  * counting, language-ID heuristic, quality scoring, document
  * fingerprinting. All column-level and codegen-friendly (built-in
  * functions; no UDFs in the hot path) so they survive 100-TB scans.
  */
object TextOps {

  /** Whitespace token count, empty-safe. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), x => x =!= lit(""))).cast("long")

  /** BPE-ish subword count: word-piece regex segmentation — counts
    * alpha runs, digit runs, and punctuation separately (a cheap
    * stand-in for a real tokenizer's piece count).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z\\u00C0-\\u024F]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  private val enStop = "the|of|and|a|in|to|is|it|that|for|on|with|as|was|at|by"
  private val ruChars = "[\\u0400-\\u04FF]"

  def stopwordHits(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(s"\\b($enStop)\\b"), lit(0))).cast("long")

  def cyrillicChars(text: Column): Column =
    size(regexp_extract_all(text, lit(ruChars), lit(0))).cast("long")

  /** Language-ID heuristic: script detection first, then English
    * stopword density. Deterministic and SQL-portable (used by the
    * DuckDB oracle).
    */
  def langId(text: Column): Column = {
    val n = greatest(length(text), lit(1)).cast("double")
    when(cyrillicChars(text) / n > 0.3, "ru")
      .when(stopwordHits(text) / greatest(tokenCount(text), lit(1)).cast("double") > 0.05, "en")
      .otherwise("unknown")
  }

  /** Quality signals: length, punctuation ratio, digit ratio, stopword
    * ratio, mean word length — combined into a [0,1] score. Weights
    * are heuristic; the point is a deterministic, fully-columnar
    * scoring pass.
    */
  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def digitRatio(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column =
    stopwordHits(text).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Integer-exact quality score in basis points (0..10000): same
    * signals as `qualityScore` but in pure integer arithmetic
    * (min/plus/integer-division), so any engine computes bit-identical
    * results — cross-engine double rounding diverges on near-ties.
    */
  def qualityScoreBp(text: Column): Column = {
    // integer floor-division; exact for our magnitudes (< 2^25 / 2^13)
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val L = length(text).cast("long")
    val L1 = greatest(L, lit(1L))
    val s = stopwordHits(text)
    val tk = greatest(tokenCount(text), lit(1L))
    val p = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    val g = size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("long")
    (lit(8L) * least(L, lit(500L)) +
      idiv(lit(3000L) * least(lit(5L) * s, tk), tk) +
      (lit(1500L) - idiv(lit(1500L) * least(lit(4L) * p, L), L1)) +
      (lit(1500L) - idiv(lit(1500L) * least(lit(4L) * g, L), L1))).as("quality_bp")
  }

  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = least(punctRatio(text) * lit(4.0), lit(1.0))
    val digitPenalty = least(digitRatio(text) * lit(4.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    round(
      lit(0.4) * lenScore + lit(0.3) * stopScore +
        lit(0.15) * (lit(1.0) - punctPenalty) +
        lit(0.15) * (lit(1.0) - digitPenalty), 4)
  }

  /** 64-bit document fingerprint: xxhash64 of the
    * whitespace-normalized text — built-in, codegen'd, exactly the
    * reference's schema-fingerprint trick (xxhash64 of joined names,
    * undatum/cmds/schemer.py:40-41) applied to content.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(trim(text), "\\s+", " "))

  /** Portable content fingerprint: md5 hex of the same normalized
    * text. Slower than xxhash64 but computable by any engine, so the
    * DuckDB oracle can verify it value-for-value (xxhash64 exists only
    * on the Spark side). Use `fingerprint` in 100-TB hot paths.
    */
  def fingerprintHex(text: Column): Column =
    md5(regexp_replace(trim(text), "\\s+", " "))

  /** Rolling polynomial hash over words (order-sensitive), as a
    * fold — stays columnar via `aggregate` higher-order function.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      filter(split(text, "\\s+"), x => x =!= lit("")),
      lit(1469598103934665603L),
      (acc, w) => acc * lit(1099511628211L) + xxhash64(w))

  /** Rank vocabulary: the top-k corpus words by frequency, id = 0-based
    * frequency rank (ties broken lexicographically) — the lookup-table
    * tokenizer's vocabulary, built with one map-side-combined count.
    */
  def buildVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
                 k: Int): org.apache.spark.sql.DataFrame = {
    val head = docs
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        w => w =!= lit(""))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(k)
    // the window runs over <=k rows (the vocab, not the corpus): a
    // single-task rank assignment over a lookup-table-sized input
    head.withColumn("tok_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("w"))) - 1).cast("int"))
      .select("w", "tok_id")
  }

  /** Lookup-table tokenization: whitespace words to vocab ids, unknown
    * words to `oovId` — the raw-text-to-TokenRow bridge in front of the
    * encode pipeline. The vocab collects to the driver and ships as a
    * Spark broadcast HashMap consulted by ONE udf call per document
    * (O(1) hash lookup per word — a literal-map `element_at` would be
    * a LINEAR scan of the vocab per word, GetMapValue has no index).
    * One corpus scan, no join, no shuffle; the broadcast ships once
    * per executor regardless of vocab size.
    */
  def tokenize(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, srcCol: String,
               vocab: org.apache.spark.sql.DataFrame,
               oovId: Int): org.apache.spark.sql.DataFrame = {
    val entries = vocab.collect()
      .map(r => (r.getAs[String]("w"), r.getAs[Int]("tok_id"))).toMap
    tokenizeMap(docs, idCol, textCol, srcCol, entries, oovId)
  }

  /** [[tokenize]] with a prebuilt word->id map (e.g. an
    * IncrementalVocab snapshot) — same one-scan broadcast-lookup plan.
    */
  def tokenizeMap(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, srcCol: String,
                  entries: Map[String, Int],
                  oovId: Int): org.apache.spark.sql.DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(entries)
    val lookup = udf((ws: Seq[String]) =>
      if (ws == null) Array.emptyIntArray
      else ws.map(w => bc.value.getOrElse(w, oovId)).toArray)
    docs.select(col(idCol).cast("string").as("doc_id"),
        lookup(filter(split(lower(col(textCol)), "\\s+"),
          w => w =!= lit(""))).as("tokens"),
        col(srcCol).as("source"))
      .withColumn("n_tok", size(col("tokens")))
      .select("doc_id", "tokens", "n_tok", "source")
  }

  /** Inverse of [[tokenize]] for inspection/debugging: token ids back
    * to whitespace-joined words via the broadcast inverse table;
    * unknown ids (the OOV sentinel included) render as `oovToken`.
    * Lossy exactly where tokenize is (case folding, whitespace runs,
    * OOV words).
    */
  def detokenize(tokens: Column, vocab: org.apache.spark.sql.DataFrame,
                 oovToken: String = "<unk>"): Column = {
    val inverse = vocab.collect()
      .map(r => (r.getAs[Int]("tok_id"), r.getAs[String]("w"))).toMap
    val bc = vocab.sparkSession.sparkContext.broadcast(inverse)
    val render = udf((ts: Seq[Int]) =>
      if (ts == null) "" else ts.map(t => bc.value.getOrElse(t, oovToken)).mkString(" "))
    render(tokens)
  }

  /** PII scrub: mask URLs then email addresses with placeholder
    * tokens (URLs first, or the mailto-ish tail of a URL would be
    * half-masked as an email). Both patterns are RE2-compatible so
    * any engine replays them identically; plain codegen'd
    * regexp_replace — one scan, no UDF.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "https?://[^\\s]+", "[URL]"),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")

  /** Within-document repetition score in basis points: the share of
    * word n-gram POSITIONS occupied by a repeated n-gram,
    * floor(10000 * (total - distinct) / total), 0 for docs with fewer
    * than n words (Gopher-style duplicate-n-gram filter; Rae et al.
    * 2021, public). Distinct counting rides the native shingle kernel,
    * so a corpus scan stays one codegen'd pass per doc.
    */
  def repetitionBp(text: Column, n: Int = 2): Column = {
    val total = greatest(tokenCount(text) - (n - 1), lit(0L))
    val distinct = size(graft.functions.Shingles.shinglesNative(text, n)).cast("long")
    when(total > 0,
      floor(lit(10000) * (total - distinct) / total).cast("long"))
      .otherwise(0L)
  }

  /** Top-k TF-IDF keywords per document: tf = term count in the doc
    * (lowercased whitespace tokens, same tokenization as [[tokenize]]
    * and the shingle kernels), idf = ln(N / df) with N = corpus row
    * count and df = docs containing the term, rank by tfidf desc then
    * term asc (fully deterministic). Output columns:
    * (idCol, term, tf, df, tfidf rounded to 4).
    *
    * Plan shape at scale: one corpus scan -> explode ->
    * map-side-combined groupBy (id, term); document frequency is a
    * second agg over that (vocabulary-sized — exchanged on the bare
    * term); N rides a single-row broadcast crossJoin (no collect);
    * the final per-doc top-k is a window on id, which AQE handles as
    * one hash exchange. Nothing driver-side, nothing quadratic.
    */
  def tfidfTopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    val terms = termFrequencies(docs, idCol, textCol)
    tfidfTail(docs, terms, idCol, k)
  }

  /** The 100-TB form of [[tfidfTopK]]: the (id, term, tf) aggregation
    * is staged to parquet ONCE and both consumers (document frequency,
    * scoring) read the stage — the unstaged plan's branches each
    * re-scan and re-explode the corpus (same trade as
    * [[graft.dedup.Dedup.stageSignatures]]). The corpus-row count for
    * idf still reads `docs`, but a parquet count(*) is satisfied from
    * row-group metadata (empty ReadSchema), not a data scan.
    */
  def tfidfTopKStaged(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, k: Int,
                      stagePath: String): org.apache.spark.sql.DataFrame = {
    termFrequencies(docs, idCol, textCol)
      .write.mode("overwrite").parquet(stagePath)
    tfidfTail(docs, docs.sparkSession.read.parquet(stagePath), idCol, k)
  }

  private def termFrequencies(docs: org.apache.spark.sql.DataFrame,
                              idCol: String,
                              textCol: String): org.apache.spark.sql.DataFrame = {
    val words = filter(split(lower(col(textCol)), "\\s+"), w => w =!= lit(""))
    docs.select(col(idCol), explode(words).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
  }

  private def tfidfTail(docs: org.apache.spark.sql.DataFrame,
                        terms: org.apache.spark.sql.DataFrame, idCol: String,
                        k: Int): org.apache.spark.sql.DataFrame = {
    val dfreq = terms.groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("long").as("__n"))
    terms.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("__n").cast("double") / col("df")))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))))
      .where(col("__rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, Appendix
    * A1.1), the pre-dedup gate of that pipeline: word-count range,
    * mean-word-length range, minimum alphabetic-word share, minimum
    * stopword hits. All integer/basis-point math (no float ratios) so
    * a SQL oracle reproduces the exact values; all built-in
    * expressions, one codegen'd scan.
    *
    * Returns columns: n_words, mean_len_bp (10000×mean word length),
    * alpha_bp (10000×alphabetic-word share), stop_hits, and the
    * individual rule booleans + conjunction `gopher_pass`.
    */
  def gopherRules(text: Column,
                  minWords: Long = 50, maxWords: Long = 100000): Column = {
    val words = filter(split(text, "\\s+"), w => w =!= lit(""))
    val n = size(words).cast("long")
    val n1 = greatest(n, lit(1L)) // divide-safe; rules still use n
    val sumLen = length(regexp_replace(text, lit("\\s"), lit(""))).cast("long")
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val meanLenBp = floor(lit(10000L) * sumLen / n1).cast("long")
    val alphaBp = floor(lit(10000L) * alphaWords / n1).cast("long")
    val stops = stopwordHits(text)
    val rWords = n.between(minWords, maxWords)
    val rMeanLen = meanLenBp.between(30000L, 100000L)
    val rAlpha = alphaBp >= 8000L
    val rStop = stops >= 2L
    struct(
      n.as("n_words"), meanLenBp.as("mean_len_bp"), alphaBp.as("alpha_bp"),
      stops.as("stop_hits"), rWords.as("r_words"), rMeanLen.as("r_mean_len"),
      rAlpha.as("r_alpha"), rStop.as("r_stop"),
      (rWords && rMeanLen && rAlpha && rStop).as("gopher_pass"))
  }

  /** Words on C4's small blocklist (a placeholder subset of the
    * public "List of Dirty, Naughty, Obscene..." the paper cites —
    * the rule's shape is what matters, the list is a parameter).
    */
  val C4BadWords: Seq[String] = Seq("porn", "xxx", "viagra")

  /** C4 quality heuristics (Raffel et al. 2020 §2.2 — the T5
    * pretraining cleanup): line-level — keep only lines that end in
    * a terminal punctuation mark (`. ! ? "` after right-trim), have
    * at least 5 whitespace words, and do not mention "javascript";
    * page-level — drop pages whose retained text has fewer than 3
    * sentences (counted as `[.!?]` occurrences in the kept lines),
    * or that contain "lorem ipsum", a curly brace `{`, or a word on
    * the blocklist (word-boundary match on the lowered page). All
    * built-in string/array expressions over one scan — split,
    * array `filter`, `regexp_extract_all` — no UDFs, so the operator
    * is a single codegen'd projection at any scale.
    *
    * Returns a struct: n_lines, n_kept, n_sentences, has_lorem,
    * has_brace, has_badword, c4_pass, text_clean (kept lines
    * re-joined with newlines; empty string when nothing survives).
    */
  def c4Rules(text: Column,
              badWords: Seq[String] = C4BadWords): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(filter(split(trim(l), "\\s+"), w => w =!= lit(""))) >= 5 &&
        !lower(l).contains("javascript"))
    val textClean = concat_ws("\n", kept)
    val nSentences =
      size(regexp_extract_all(textClean, lit("[.!?]"), lit(0))).cast("long")
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")
    // plain alternation; each entry backslash-escaped per char (NOT
    // Pattern.quote's \Q..\E, which RE2 lacks) so the same pattern
    // text runs under both Java regex and an RE2 oracle, and a
    // caller-supplied entry like "c++" or "a.b" can neither crash
    // compilation nor silently broaden the blocklist
    val badRe = badWords
      .map(_.replaceAll("([^A-Za-z0-9 _])", "\\\\$1")).mkString("|")
    val hasBad = lower(text).rlike(s"\\b($badRe)\\b")
    struct(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      nSentences.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      hasBad.as("has_badword"),
      (nSentences >= 3L && !hasLorem && !hasBrace && !hasBad).as("c4_pass"),
      textClean.as("text_clean"))
  }

  /** Cross-document LINE dedup — the CCNet/RefinedWeb boilerplate
    * pass (Wenzek et al. 2019 §4.1 dedups the corpus at paragraph
    * granularity; Penedo et al. 2023 removes lines repeated across
    * documents: nav bars, cookie banners, footers). A line whose
    * normalized key (lower+trim) occurs >= `minDup` times ACROSS the
    * corpus is removed from every document; whitespace-only lines are
    * structural and always kept. Returns one row per input document:
    * (id, text_kept, n_kept, n_removed), empty string when every line
    * was boilerplate.
    *
    * Scale shape: one explode, one map-side-combined count on the
    * normalized key, one left join of lines against the (usually
    * tiny: it is the boilerplate set) dup-key frame — AQE broadcasts
    * it when small, falls back to an 8-byte-ish hash shuffle when
    * not — and one reassembly exchange on doc id. No driver-side
    * state, no per-row UDFs; line order is restored by sorting the
    * collected (pos, line) structs, never by assuming shuffle order.
    */
  def lineDedup(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, minDup: Int,
                delim: String = "\n"): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim))).as(Seq("__lp", "__ll")))
      .withColumn("__lk", lower(trim(col("__ll"))))
    val dup = lines.where(col("__lk") =!= "")
      .groupBy("__lk").agg(count(lit(1)).as("__lc"))
      .where(col("__lc") >= minDup)
      .select(col("__lk"), lit(true).as("__ldup"))
    lines.join(dup, Seq("__lk"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(delim, transform(
          filter(
            array_sort(collect_list(struct(col("__lp").as("p"),
              col("__ll").as("l"), col("__ldup").isNull.as("keep")))),
            x => x.getField("keep")),
          x => x.getField("l"))).as("text_kept"),
        sum(when(col("__ldup").isNull, 1L).otherwise(0L))
          .cast("long").as("n_kept"),
        sum(when(col("__ldup").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_removed"))
  }
}
