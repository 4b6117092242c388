package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.dedup.Dedup

/** Round-5 additions: SemDeDup-style semantic dedup over an embedding
  * column (planted-structure correctness; the value-for-value path is
  * the q_semantic_dedup oracle row).
  */
class SemanticDedupSpec extends SparkSpecBase {

  /** `n` vectors near `center` (tiny deterministic jitter) + the rest
    * far away on distinct axes.
    */
  private def df(rows: Seq[(Long, Array[Float])]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v.toSeq) }),
      schema)
  }

  private def axis(dim: Int, i: Int, scale: Float = 1f): Array[Float] = {
    val a = new Array[Float](dim); a(i) = scale; a
  }

  test("planted semantic clusters: min id survives, isolated points kept") {
    val dim = 8
    // cluster A: ids 10,11,12 all ≈ e0; cluster B: ids 20,21 ≈ e1;
    // isolated: ids 30 (e2), 31 (e3)
    def jitter(base: Array[Float], eps: Float, at: Int): Array[Float] = {
      val v = base.clone(); v(at) = v(at) + eps; v
    }
    val e0 = axis(dim, 0); val e1 = axis(dim, 1)
    val rows = Seq(
      10L -> e0, 11L -> jitter(e0, 0.05f, 4), 12L -> jitter(e0, -0.04f, 5),
      20L -> e1, 21L -> jitter(e1, 0.06f, 6),
      30L -> axis(dim, 2), 31L -> axis(dim, 3))
    // k=1: one cell — no boundary effects; threshold 0.9 separates the
    // planted clusters (within-cluster cos ≈ 0.998, cross ≈ 0)
    val out = Dedup.semanticDedup(df(rows), "id", "vec",
      threshold = 0.9, k = 1)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 20L, 30L, 31L))
  }

  test("cell boundaries bound the comparison set (documented recall trade)") {
    val dim = 4
    // two far-apart clumps force k=2 k-means to split them; a planted
    // near-dup PAIR straddling nothing (both in one clump) is pruned,
    // while the clumps themselves never cross-compare
    val e0 = axis(dim, 0); val e1 = axis(dim, 1)
    val rows = Seq(
      1L -> e0, 2L -> { val v = e0.clone(); v(2) = 0.03f; v },
      5L -> e1, 6L -> { val v = e1.clone(); v(3) = 0.02f; v })
    val out = Dedup.semanticDedup(df(rows), "id", "vec",
      threshold = 0.9, k = 2)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 5L))
  }

  test("no pairs above threshold -> everything survives") {
    val dim = 6
    val rows = (0 until 5).map(i => i.toLong -> axis(dim, i))
    val out = Dedup.semanticDedup(df(rows), "id", "vec",
      threshold = 0.5, k = 2)
    assert(out.count() == 5)
  }

  test("multi-probe p=2 recovers a boundary-straddling near-dup pair") {
    val dim = 4
    def unit(a: Float, b: Float, j: Float): Array[Float] = {
      val v = Array(a, b, j, 0f)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val e0 = axis(dim, 0); val e1 = axis(dim, 1)
    // two clumps pin the k=2 centroids near e0/e1; the planted
    // near-dup pair (cos ≈ 0.999) sits between them with 300 argmin
    // on the e0 cell and 301 on the e1 cell — invisible at p=1
    val clumpA = (0 until 4).map(i =>
      (100L + i) -> { val v = e0.clone(); v(3) = 0.01f * i; v })
    val clumpB = (0 until 4).map(i =>
      (200L + i) -> { val v = e1.clone(); v(3) = 0.01f * i; v })
    val rows = clumpA ++ clumpB ++ Seq(
      300L -> unit(0.72f, 0.69f, 0.001f),
      301L -> unit(0.69f, 0.72f, -0.001f))
    val p1 = Dedup.semanticDedup(df(rows), "id", "vec",
      threshold = 0.97, k = 2, probes = 1)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(p1 == Seq(100L, 200L, 300L, 301L)) // pair straddles, missed
    val p2 = Dedup.semanticDedup(df(rows), "id", "vec",
      threshold = 0.97, k = 2, probes = 2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(p2 == Seq(100L, 200L, 300L)) // runner-up cell meets the pair
    // assignTop contract: first element IS the argmin cell; distances
    // ascend, so p=1 semantics embed in the multi-probe assignment
    val idx = graft.sim.Ivf.train(df(rows), "vec", 2)
    val one = graft.sim.Ivf.assign(df(rows), "vec", idx)
      .select("id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    graft.sim.Ivf.assignTop(df(rows), "vec", idx, 2)
      .select("id", "ivf_cells").collect().foreach { r =>
        val cs = r.getSeq[Int](1)
        assert(cs.length == 2 && cs.distinct.length == 2)
        assert(cs.head == one(r.getLong(0)))
      }
  }
}

class TfidfSpec extends SparkSpecBase {

  test("hand-computed tfidf: common term ranks below rare term") {
    val s = spark
    import s.implicits._
    // 4 docs; "the" in all (idf=0), "cat"/"dog" in one each
    val docs = Seq(
      (1L, "the cat the cat sat"),
      (2L, "the dog ran"),
      (3L, "the bird the bird the bird"),
      (4L, "the fish")).toDF("doc_id", "text")
    val out = graft.text.TextOps.tfidfTopK(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "term").collect()
    val d1 = out.filter(_.getLong(0) == 1L).map(r =>
      (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // doc 1: cat tf=2 df=1 -> 2*ln(4)=2.7726; sat tf=1 df=1 -> 1.3863;
    // "the" (idf=ln(1)=0) must NOT make top-2
    assert(d1.toSeq == Seq(
      ("cat", 2L, 1L, math.rint(2 * math.log(4.0) * 10000) / 10000),
      ("sat", 1L, 1L, math.rint(math.log(4.0) * 10000) / 10000)))
    // "the" (idf=0) only surfaces where a doc has < k nonzero terms
    // (docs 3, 4); where competition exists (docs 1, 2) it never ranks
    assert(!out.exists(r =>
      r.getString(1) == "the" && (r.getLong(0) == 1L || r.getLong(0) == 2L)))
    // every doc contributes at most k rows
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 2))
  }

  test("staged form equals the unstaged plan") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "delta")
    ).toDF("doc_id", "text")
    val a = graft.text.TextOps.tfidfTopK(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "term").collect().toSeq
    val b = graft.text.TextOps.tfidfTopKStaged(docs, "doc_id", "text", 2,
      tmpDir("tfidf-stage") + "/t").orderBy("doc_id", "term").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("deterministic tie-break on term for equal tfidf") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "b a"), (2L, "z y")).toDF("doc_id", "text")
    val out = graft.text.TextOps.tfidfTopK(docs, "doc_id", "text", k = 1)
      .orderBy("doc_id").collect()
    // all four terms have tf=1, df=1 — rank 1 must be the
    // lexicographically first term of each doc
    assert(out.map(_.getString(1)).toSeq == Seq("a", "y"))
  }

  test("UrlOps: canonicalization edges beyond the oracle families") {
    val s = spark
    import s.implicits._
    import graft.functions.UrlOps
    val urls = Seq(
      "https://u:p@Host.Example.COM:8443/a?gclid=1&x=2&utm_a=3&y=4",
      "http://example.com:8080/keep-port",
      "https://example.com/?utm_only=1",
      "HTTP://EXAMPLE.COM:80",
      "nothing here",
      "https://localhost/x"
    ).toDF("url")
    val out = urls.select(
      UrlOps.canonicalizeUrl($"url").as("c"),
      UrlOps.host($"url").as("h"),
      UrlOps.registrableDomain($"url").as("d")).collect()
    // userinfo kept (canonicalization never drops credentials silently),
    // authority lowercased, non-default port kept, both trackers gone
    assert(out(0).getString(0) == "https://u:p@host.example.com:8443/a?x=2&y=4")
    assert(out(0).getString(1) == "host.example.com")
    assert(out(0).getString(2) == "example.com")
    assert(out(1).getString(0) == "http://example.com:8080/keep-port")
    assert(out(2).getString(0) == "https://example.com/")
    assert(out(3).getString(0) == "http://example.com")
    assert(out(4).getString(0) == "nothing here" && out(4).getString(1) == "")
    assert(out(5).getString(1) == "localhost" && out(5).getString(2) == "")
  }

  test("urlDedup: distinct raw fetches with one canonical form collapse") {
    val s = spark
    import s.implicits._
    import graft.functions.UrlOps
    val fetches = Seq(
      (7L, "https://Example.com/a?utm_source=x"),
      (3L, "HTTPS://example.COM:443/a#frag"),
      (9L, "https://example.com/a"),
      (5L, "https://example.com/b")
    ).toDF("doc_id", "url")
    val out = UrlOps.urlDedup(fetches, "doc_id", "url")
      .orderBy("canon_url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "https://example.com/a")
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 3L)
    assert(out(1).getString(0) == "https://example.com/b")
    assert(out(1).getLong(1) == 5L && out(1).getLong(2) == 1L)
  }

  test("domainFilter: one blocked registrable domain drops every host under it") {
    val s = spark
    import s.implicits._
    import graft.functions.UrlOps
    val rows = Seq(
      (1L, "https://www.spam.com/x"),
      (2L, "https://cdn.spam.com/y"),
      (3L, "https://spam.com.evil.org/z"), // domain is evil.org, NOT spam.com
      (4L, "https://good.co.uk/a"),
      (5L, "https://sub.good.co.uk/b")
    ).toDF("doc_id", "url")
    val block = Seq("spam.com", "good.co.uk").toDF("domain")
    val kept = UrlOps.domainFilter(rows, "url", block)
      .orderBy("doc_id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("Dsir: target-like docs outscore off-target docs; empty text scores 0") {
    val s = spark
    import s.implicits._
    import graft.text.Dsir
    val raw = Seq(
      (1L, "apple banana apple banana cherry"),
      (2L, "apple banana cherry apple banana"),
      (3L, "xyzzy quux grault xyzzy quux"),
      (4L, "quux grault xyzzy grault quux"),
      (5L, "")
    ).toDF("doc_id", "text")
    val target = raw.where($"doc_id" <= 2)
    val (ratios, default) = Dsir.logRatiosMicro(target, raw, "text", 2)
    val w = Dsir.docLogWeightsMicro(raw, "doc_id", "text", ratios, default, 2)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // DSIR scores are RELATIVE (smoothing over the 256-bucket space
    // shrinks all ratios toward 0 when the corpora are tiny): target-
    // like docs must outscore off-target docs, and off-target docs —
    // whose buckets are raw-only — must land clearly negative
    assert(w(1L) > w(3L) && w(2L) > w(4L))
    assert(w(5L) == 0L)
    assert(w(3L) < 0L && w(4L) < 0L)
  }

  test("Dsir: resample is the deterministic Gumbel top-k, no dupes") {
    val s = spark
    import s.implicits._
    import graft.text.Dsir
    val raw = (0L until 40L).map(i =>
      (i, if (i % 4 == 0) "apple banana cherry" else "xyzzy quux grault"))
      .toDF("doc_id", "text")
    val target = raw.where($"doc_id" % 4 === 0)
    val (ratios, default) = Dsir.logRatiosMicro(target, raw, "text", 2)
    val w = Dsir.docLogWeightsMicro(raw, "doc_id", "text", ratios, default, 2)
    val picked = Dsir.resample(w, "doc_id", 10).collect()
    assert(picked.length == 10)
    assert(picked.map(_.getLong(0)).distinct.length == 10)
    // deterministic seed: a second draw returns identical picks
    val again = Dsir.resample(w, "doc_id", 10).collect()
    assert(picked.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // the upweighted minority (10 of 40 docs) should dominate the sample
    val fruity = picked.count(_.getLong(0) % 4 == 0)
    assert(fruity >= 7, s"expected mostly target-like picks, got $fruity/10")
  }

  test("LmScore: rare/OOV-heavy docs score higher perplexity; empty doc 0") {
    val s = spark
    import s.implicits._
    import graft.text.LmScore
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat again"),
      (2L, "the cat sat on the mat"),
      (3L, "zyxwv qponm lkjih gfedc"), // in vocab (learned on corpus) but rare
      (4L, "")
    ).toDF("doc_id", "text")
    val (model, oov) = LmScore.unigramLmMicro(docs, "text", 512)
    val out = LmScore.docPerplexityMicro(docs, "doc_id", "text", model, oov)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(3L)._3 > out(1L)._3, "rare-word doc must out-perplex common doc")
    assert(out(4L) == ((0L, 0L, 0L)))
    // OOV words (never seen at learn time) cost the most
    val (modelSmall, oovSmall) = LmScore.unigramLmMicro(
      docs.where($"doc_id" <= 2), "text", 512)
    val out2 = LmScore.docPerplexityMicro(docs, "doc_id", "text",
        modelSmall, oovSmall)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out2(3L) > out2(1L) && out2(3L) > out2(2L))
    // mean NLL identity: nll_micro/n rounds to ppl_micro
    val (n1, s1, p1) = out(1L)
    assert(p1 == math.floor(s1.toDouble / n1 + 0.5).toLong)
  }

  test("substrDupStats: planted shared span flags exactly its windows") {
    val s = spark
    import s.implicits._
    import graft.dedup.Dedup
    val span = "one two three four" // shared 4-word span
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),     // 8 words, 5 windows(k=4)
      (2L, s"$span epsilon zeta eta theta"),     // span at the start
      (3L, "iota kappa lambda mu nu xi"),        // no overlap
      (4L, "tiny doc"),                          // < k words -> 0 windows
      (5L, "rep rep rep rep rep rep rep")        // within-doc repetition
    ).toDF("doc_id", "text")
    val out = Dedup.substrDupStats(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // docs 1 and 2 share exactly ONE window: the span itself
    assert(out(1L) == ((5L, 1L, 2000L)))
    assert(out(2L) == ((5L, 1L, 2000L)))
    assert(out(3L) == ((3L, 0L, 0L)))
    assert(out(4L) == ((0L, 0L, 0L)))
    // "rep"x7 with k=4: all 4 windows are the same key -> all duplicated
    assert(out(5L) == ((4L, 4L, 10000L)))
    // portable (md5) and hot-path (xxhash64) forms agree
    val p = Dedup.substrDupStats(docs, "doc_id", "text", k = 4,
      portable = true).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val h = Dedup.substrDupStats(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(p.toSeq == h.toSeq)
  }

  test("DsirBuckets native kernel equals the declarative formulation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val b = 64
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "single",
      "",
      "   leading and   multi  spaces\ttabs\nnewlines  ",
      "ünïcödé wörds ALSO Mixed CASE",
      "a b", "x"
    ) ++ (0 until 50).map(i => s"doc $i body word$i tail common words here")
    val df = texts.toDF("text")
    val ws = filter(split(lower($"text"), "\\s+"), w => w =!= lit(""))
    val declUni = transform(ws, w => pmod(xxhash64(w), lit(b.toLong)).cast("int"))
    val declBi = when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => pmod(xxhash64(concat_ws(" ", slice(ws, i + 1, lit(2)))),
          lit(b.toLong)).cast("int")))
      .otherwise(array().cast("array<int>"))
    val rows = df.select(
      graft.text.Dsir.featuresFast($"text", b).as("fast"),
      concat(declUni, declBi).as("decl")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"mismatch for text: '$t'")
    }
  }

  test("Dsir fast path: same ordering properties as the portable form") {
    val s = spark
    import s.implicits._
    import graft.text.Dsir
    val raw = Seq(
      (1L, "apple banana apple banana cherry", "en"),
      (2L, "apple banana cherry apple banana", "en"),
      (3L, "xyzzy quux grault xyzzy quux", "xx"),
      (4L, "quux grault xyzzy grault quux", "xx"),
      (5L, "", "xx")
    ).toDF("doc_id", "text", "lang")
    val w = Dsir.dsirWeightsFast(raw, "doc_id", "text", $"lang" === "en", 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w(1L) > w(3L) && w(2L) > w(4L))
    assert(w(5L) == 0L)
    assert(w(3L) < 0L && w(4L) < 0L)
  }

  test("substrDedupTrim: keep-first trims later occurrences only") {
    val s = spark
    import s.implicits._
    import graft.dedup.Dedup
    val span = "one two three four"
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"$span epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu"),
      (5L, "rep rep rep rep rep rep rep")
    ).toDF("doc_id", "text")
    val out = Dedup.substrDedupTrim(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("text_dedup")).toMap
    // doc 1 (lowest id) keeps its copy of the span; doc 2 loses it
    assert(out(1L) == s"alpha beta $span gamma delta")
    assert(out(2L) == "epsilon zeta eta theta")
    assert(out(3L) == "iota kappa lambda mu")
    // self-repetition: first window kept, overlapping later ones trimmed
    assert(out(5L) == "rep")
    // the map-side production kernel and the oracle-replayed portable
    // form trim identically (r7: the non-portable path groups windows
    // per doc in one kernel pass instead of the explode + exchange)
    val messy = docs.union(Seq(
      (6L, s"  $span\t$span   $span "), // repeated span, messy whitespace
      (7L, "")).toDF("doc_id", "text"))
    val p = Dedup.substrDedupTrim(messy, "doc_id", "text", k = 4,
      portable = true).select("doc_id", "text_dedup")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val h = Dedup.substrDedupTrim(messy, "doc_id", "text", k = 4)
      .select("doc_id", "text_dedup")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(p.toSeq == h.toSeq)
    // withCounts derivation (r7): n_before/n_after must equal the
    // re-tokenized truth on messy whitespace, repeated spans, empty
    // and NULL texts — for both the portable and the kernel path
    import org.apache.spark.sql.functions.col
    val withNull = messy.union(Seq((8L, null: String)).toDF("doc_id", "text"))
    for (portable <- Seq(true, false)) {
      val rows = Dedup.substrDedupTrim(withNull, "doc_id", "text", k = 4,
          portable = portable, withCounts = true)
        .select(col("doc_id"), col("n_before"), col("n_after"),
          graft.text.TextOps.tokenCount(col("text")).as("tb"),
          graft.text.TextOps.tokenCount(col("text_dedup")).as("ta"))
        .collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(3) &&
          (r.isNullAt(1) || r.getLong(1) == r.getLong(3)),
          s"n_before mismatch portable=$portable: $r")
        assert(r.getLong(2) == r.getLong(4),
          s"n_after mismatch portable=$portable: $r")
      }
    }
  }

  test("gopherRules: rule booleans fire on the right pathologies") {
    val s = spark
    import s.implicits._
    // 60 words, mean length well over 3, all alphabetic, stopword hits
    val good =
      ("the quality filtering pipeline processes documents with great care " * 7)
        .trim
    val docs = Seq(
      (1L, good),                      // passes everything
      (2L, "short doc the of"),        // fails word count, has stops
      (3L, ("12345 67890 " * 30).trim), // no alpha words, no stops
      (4L, ("x " * 60).trim)           // mean word len 1 < 3
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        graft.text.TextOps.gopherRules($"text").as("g"))
      .select($"doc_id", $"g.*").orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("gopher_pass"))
    assert(!out(1).getAs[Boolean]("r_words") && out(1).getAs[Boolean]("r_stop"))
    assert(!out(2).getAs[Boolean]("r_alpha") && !out(2).getAs[Boolean]("r_stop"))
    assert(!out(3).getAs[Boolean]("r_mean_len"))
    assert(out(3).getAs[Long]("mean_len_bp") == 10000L)
    // empty text is divide-safe
    val e = Seq((9L, "")).toDF("doc_id", "text")
      .select(graft.text.TextOps.gopherRules($"text").as("g"))
      .select($"g.*").collect()(0)
    assert(e.getAs[Long]("n_words") == 0L && !e.getAs[Boolean]("gopher_pass"))
  }

  test("lineDedup removes corpus-wide boilerplate, keeps structure") {
    val s = spark
    import s.implicits._
    val banner = "Accept our cookies"
    val docs = Seq(
      (1L, s"$banner\nunique one\n\nclosing one"),
      (2L, s"  accept our COOKIES \nunique two"), // normalized same key
      (3L, s"$banner\nunique three"),
      (4L, banner) // entirely boilerplate
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.lineDedup(docs, "doc_id", "text", minDup = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    // banner occurs 3x across the corpus (trim+lower key) -> removed
    assert(out(0).getString(1) == "unique one\n\nclosing one") // blank kept
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 1L)
    assert(out(1).getString(1) == "unique two")
    assert(out(2).getString(1) == "unique three")
    // all-boilerplate doc survives as a row with empty text
    assert(out(3).getString(1) == "" && out(3).getLong(2) == 0L
      && out(3).getLong(3) == 1L)
  }

  test("lineDedup below threshold removes nothing; order preserved") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "dup line\nalpha\nbeta"),
      (2L, "dup line\ngamma")
    ).toDF("doc_id", "text")
    val out = graft.text.TextOps.lineDedup(docs, "doc_id", "text", minDup = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "dup line\nalpha\nbeta")
    assert(out(1).getString(1) == "dup line\ngamma")
    assert(out.forall(_.getLong(3) == 0L))
  }

  test("NbQuality: in-class docs score positive, off-class negative") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.NbQuality
    // balanced classes with disjoint vocabularies: NB must separate
    val pos = (0 until 20).map(i => (i.toLong, s"good clean prose $i", true))
    val neg = (0 until 20).map(i => (100L + i, s"spam junk noise $i", false))
    val df = (pos ++ neg).toDF("doc_id", "text", "label")
    val m = NbQuality.trainMicro(df, col("label"), "text", hexChars = 2)
    val out = NbQuality.score(df, "doc_id", "text", m, hexChars = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos.forall { case (id, _, _) => out(id) > 0 })
    assert(neg.forall { case (id, _, _) => out(id) < 0 })
    // balanced classes -> prior ~ 0 (exactly ln(21/21) = 0)
    assert(m.priorMicro == 0L)
  }

  test("NbQuality: empty text scores the bare prior; skewed prior sign") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.NbQuality
    val df = Seq(
      (1L, "alpha beta", true), (2L, "alpha gamma", true),
      (3L, "alpha delta", true), (4L, "zeta eta", false),
      (5L, "", false)
    ).toDF("doc_id", "text", "label")
    val m = NbQuality.trainMicro(df, col("label"), "text", hexChars = 2)
    // prior = ln((3+1)/(2+1)) > 0
    assert(m.priorMicro == math.floor(math.log(4.0 / 3.0) * 1e6 + 0.5).toLong)
    val out = NbQuality.score(df, "doc_id", "text", m, hexChars = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) == m.priorMicro)
  }

  test("NbQuality fast path: same decisions as the portable form") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.NbQuality
    val pos = (0 until 20).map(i => (i.toLong, s"good clean prose $i", true))
    val neg = (0 until 20).map(i => (100L + i, s"spam junk noise $i", false))
    val df = (pos ++ neg).toDF("doc_id", "text", "label")
    val out = NbQuality.classifyFast(df, "doc_id", "text", col("label"), 256)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(pos.forall { case (id, _, _) => out(id) })
    assert(neg.forall { case (id, _, _) => !out(id) })
  }
}

class BpeSpec extends SparkSpecBase {
  import graft.text.Bpe

  test("train: Sennrich example merges in deterministic tie-broken order") {
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val m = Bpe.train(hist, numMerges = 10)
    // pair counts: (e,s)=9 (s,t)=9 (t,Eow)=9 (l,o)=7 (o,w)=7 ...
    // ties break lexicographically: e<s<t, so es, then est, then
    // est+Eow, then the 7-count chain l-o, lo-w
    assert(m.merges.take(3) == Vector(("e", "s"), ("es", "t"),
      ("est", Bpe.Eow)))
    assert(m.merges.slice(3, 5) == Vector(("l", "o"), ("lo", "w")))
    // vocab: UNK first, then sorted alphabet, then merge outputs
    assert(m.vocab(Bpe.Unk) == 0)
    assert(m.vocab.contains("est" + Bpe.Eow))
  }

  test("encodeWord applies merges by rank; unseen char maps to UNK") {
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    // with exactly the first 3 merges, "newest" = n e w est+Eow
    val m3 = Bpe.train(hist, numMerges = 3)
    val est = Bpe.encodeWord("newest", m3)
    assert(est.toSeq == Seq(m3.vocab("n"), m3.vocab("e"), m3.vocab("w"),
      m3.vocab("est" + Bpe.Eow)))
    // with 10 merges the whole word fuses into one symbol
    val m = Bpe.train(hist, numMerges = 10)
    assert(Bpe.encodeWord("newest", m).length == 1)
    // 'z' never appeared in training
    assert(Bpe.encodeWord("z", m).contains(m.unkId))
  }

  test("corpus round trip: encode then decode = normalized text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the   quick\tbrown\nfox"), // whitespace normalizes
      (3L, ""),
      (4L, "ünïcödé wörds and ASCII mixed"),
      (5L, "emoji 😀😀 survive as code points"),
      (6L, "literal </w> markup must not forge a boundary"),
      (7L, "single")
    ).toDF("doc_id", "text")
    val m = Bpe.trainOn(docs, "text", maxWords = 1000, numMerges = 50)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
    val rt = Bpe.decode(enc, "doc_id", "tokens", m)
      .orderBy("doc_id").collect().map(_.getString(1))
    val expect = docs.orderBy("doc_id").collect().map(
      _.getString(1).split("\\s+").filter(_.nonEmpty).mkString(" "))
    assert(rt.toSeq == expect.toSeq)
  }

  test("histogram cut does not break lossless coverage of tail words") {
    val s = spark
    import s.implicits._
    // head words carry the mass; tail words never enter the histogram
    // but their CHARS do (full-corpus alphabet) -> still lossless
    val docs = ((0 until 30).map(i => (i.toLong, "common words repeat")) ++
      Seq((100L, "zymurgy xylophone quixotic"))).toDF("doc_id", "text")
    val m = Bpe.trainOn(docs, "text", maxWords = 3, numMerges = 20)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
    val rt = Bpe.decode(enc, "doc_id", "tokens", m)
      .where($"doc_id" === 100L).collect()(0).getString(1)
    assert(rt == "zymurgy xylophone quixotic")
  }

  test("tokenTable feeds the columnar encode pipeline end-to-end") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "web"),
      (2L, "beta gamma delta", "web"),
      (3L, "alpha alpha alpha", "books")
    ).toDF("doc_id", "text", "source")
    val m = Bpe.trainOn(docs, "text", maxWords = 100, numMerges = 30)
    val tt = Bpe.tokenTable(docs, "doc_id", "text", "source", m)
      .as[graft.model.TokenRow]
    val out = java.nio.file.Files.createTempDirectory("bpe-enc").toString
    graft.encode.TokenEncoder.run(tt, out)
    val back = graft.encode.TokenDecoder.read(s, out)
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    val orig = tt.collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(back == orig) // raw text -> BPE ids -> columnar -> back
  }
}

class HtmlExtractSpec extends SparkSpecBase {
  import graft.functions.HtmlExtract

  test("blocks: headings, paragraphs, inline tags, stats") {
    val bs = HtmlExtract.blocks(
      "<html><body><h1>Big News</h1><p>Hello <b>bold</b> world</p>" +
        "<div>Menu: <a href='/x'>home</a> <a href='/y'>about us</a></div>" +
        "</body></html>")
    assert(bs.map(_.text) ==
      Seq("Big News", "Hello bold world", "Menu: home about us"))
    assert(bs(0).heading && !bs(1).heading)
    assert(bs(1).nWords == 3 && bs(1).anchorWords == 0)
    assert(bs(2).nWords == 4 && bs(2).anchorWords == 3) // home, about, us
  }

  test("script/style dropped; </scripty> cannot close <script>") {
    val bs = HtmlExtract.blocks(
      "<p>keep</p><script>var a = '<p>no</p>'; x()</scripty> still js" +
        "</SCRIPT><p>after</p><style>p { color: red }</style>")
    assert(bs.map(_.text) == Seq("keep", "after"))
  }

  test("comments, doctype, CDATA, quoted '>' in attributes") {
    val bs = HtmlExtract.blocks(
      "<!DOCTYPE html><!-- a comment <p>x</p> --><p data-q=\"a > b\">" +
        "one</p><![CDATA[raw & text]]><p>two</p>")
    // </p> is a block boundary, so the CDATA text is its own block
    assert(bs.map(_.text) == Seq("one", "raw & text", "two"))
  }

  test("entities: named, numeric, hex, nbsp, unknown pass-through") {
    val bs = HtmlExtract.blocks(
      "<p>A &amp; B &lt;tag&gt; &#65;&#x42; a&nbsp;b &bogus; &#xZZ; end</p>")
    assert(bs.map(_.text) == Seq("A & B <tag> AB a b &bogus; &#xZZ; end"))
  }

  test("malformed input never throws; unterminated constructs eat to EOF") {
    assert(HtmlExtract.blocks("<p>ok<script>never closed").map(_.text)
      == Seq("ok"))
    assert(HtmlExtract.blocks("<!-- never closed <p>x").isEmpty)
    assert(HtmlExtract.blocks("text < 5 and > 3").map(_.text)
      == Seq("text < 5 and > 3")) // stray < before space is literal
    assert(HtmlExtract.blocks("<p att='unterminated").map(_.text) == Nil)
  }

  test("mainContent drops short and link-dense blocks, keeps headings") {
    val s = spark
    import s.implicits._
    val html =
      "<h1>Title</h1><p>This paragraph has more than five words in it</p>" +
        "<div><a href='/'>nav</a> <a href='/'>links</a> <a href='/'>only</a>" +
        " <a href='/'>menu</a> <a href='/'>bar</a> <a href='/'>here</a></div>" +
        "<p>tiny</p>"
    val out = Seq(html).toDF("html")
      .select(HtmlExtract.mainContent($"html", minWords = 5,
        maxAnchorPct = 50).as("t"))
      .collect()(0).getString(0)
    assert(out == "Title\nThis paragraph has more than five words in it")
  }

  test("native expression participates in whole-stage codegen") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // a range source (not a LocalTableScan, which folds eagerly)
    val df = s.range(1)
      .select(concat(lit("<p>a b "), $"id".cast("string"), lit("</p>"))
        .as("html"))
      .select(graft.functions.HtmlExtract.blocksOf($"html").as("b"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect()(0).getSeq[org.apache.spark.sql.Row](0).head
      .getString(0) == "a b 0")
  }
}
