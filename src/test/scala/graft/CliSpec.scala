package graft

import org.apache.spark.sql.functions._

import graft.tools.UndatumCli

/** The undatum-compatible CLI (tools.UndatumCli): every command
  * dispatched through run() against real files, format inference,
  * dictquery --filter, split side outputs, validate modes, SQL query.
  */
class CliSpec extends SparkSpecBase {

  private def writeCsv(): String = {
    val dir = tmpDir("cli-in")
    val p = s"$dir/people.csv"
    val w = new java.io.PrintWriter(p, "UTF-8")
    w.println("name,lang,age,email")
    w.println("ann,en,34,ann@example.org")
    w.println("bo,de,22,bo@example.org")
    w.println("cy,en,41,not-an-email")
    w.close()
    p
  }

  test("frequency / uniq / select with dictquery filter and format inference") {
    val s = spark
    val p = writeCsv()
    val freq = UndatumCli.run(s, "frequency", p, Map("fields" -> "lang")).get
      .orderBy(col("count").desc, col("lang")).collect()
    assert(freq.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("en", 2L), ("de", 1L)))
    val uniq = UndatumCli.run(s, "uniq", p, Map("fields" -> "lang")).get
    assert(uniq.count() == 2)
    val sel = UndatumCli.run(s, "select", p,
      Map("fields" -> "name,age", "filter" -> "`lang` == 'en'")).get
    assert(sel.columns.toSeq == Seq("name", "age") && sel.count() == 2)
  }

  test("headers / stats / scheme / flatten run over an inferred csv") {
    val s = spark
    val p = writeCsv()
    assert(UndatumCli.run(s, "headers", p, Map.empty).get
      .collect().map(_.getString(0)).toSet == Set("name", "lang", "age", "email"))
    val st = UndatumCli.run(s, "stats", p, Map.empty).get
    assert(st.where(col("field") === "lang").count() == 1)
    assert(UndatumCli.run(s, "scheme", p, Map.empty).get.count() == 4)
    assert(UndatumCli.run(s, "flatten", p, Map.empty).get.count() == 4)
  }

  test("validate email rule: stats and invalid modes agree") {
    val s = spark
    val p = writeCsv()
    val stats = UndatumCli.run(s, "validate", p,
      Map("fields" -> "email", "rule" -> "email", "mode" -> "stats")).get
      .collect()(0)
    assert(stats.getLong(0) == 3L && stats.getLong(1) == 1L)
    val bad = UndatumCli.run(s, "validate", p,
      Map("fields" -> "email", "rule" -> "email")).get.collect()
    assert(bad.length == 1 && bad(0).getAs[String]("name") == "cy")
  }

  test("split by field writes one directory per value") {
    val s = spark
    val p = writeCsv()
    val out = tmpDir("cli-split") + "/parts"
    assert(UndatumCli.run(s, "split", p,
      Map("fields" -> "lang", "output" -> out)).isEmpty)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.exists(_.contains("en")) && dirs.exists(_.contains("de")), dirs)
  }

  test("review regressions: no --fields defaults, explicit flags honored without --format-in") {
    val s = spark
    val dir = tmpDir("cli-rr")
    val p = s"$dir/dup.csv"
    val w = new java.io.PrintWriter(p, "UTF-8")
    w.println("a,b"); w.println("1,x"); w.println("1,x"); w.println("2,y")
    w.close()
    // uniq without --fields = whole-record dedup, not a zero-column frame
    val u = UndatumCli.run(s, "uniq", p, Map.empty).get
    assert(u.columns.toSeq == Seq("a", "b") && u.count() == 2)
    // select without --fields = all columns (filter-only select)
    val sel = UndatumCli.run(s, "select", p, Map("filter" -> "`b` == 'y'")).get
    assert(sel.columns.toSeq == Seq("a", "b") && sel.count() == 1)
    // an explicit --delimiter must be honored even without --format-in
    // (the sniff would have detected ','; the flag forces ';' -> the
    // whole header lands in ONE column)
    val one = UndatumCli.run(s, "headers", p, Map("delimiter" -> ";")).get
    assert(one.count() == 1, one.collect().mkString(","))
  }

  test("query runs SQL over the input as table `data`; convert honors format-out") {
    val s = spark
    val p = writeCsv()
    val q = UndatumCli.run(s, "query", p,
      Map("query" -> "SELECT lang, count(*) AS n FROM data GROUP BY 1")).get
      .orderBy("lang").collect()
    assert(q.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("de", 1L), ("en", 2L)))
    // convert: returned frame is the converted table; write as jsonl
    val conv = UndatumCli.run(s, "convert", p, Map.empty).get
    val out = tmpDir("cli-conv") + "/out.jsonl"
    graft.sources.Converter.write(conv, out, "jsonl")
    val back = s.read.json(out)
    assert(back.count() == 3)
  }

  test("store commands: encode / searchenc / countenc / frequencyenc / decode") {
    val s = spark
    import s.implicits._
    val in = tmpDir("cli-store-in")
    val store = s"${tmpDir("cli-store")}/store"
    graft.synth.TokenSynth.dataset(s, 400).toDF()
      .write.mode("overwrite").parquet(s"$in/rows.parquet")
    // encode prints its own summary and returns None — main()'s
    // generic --output epilogue must never overwrite the store dir
    assert(UndatumCli.run(s, "encode", s"$in/rows.parquet",
      Map("output" -> store, "rows-per-part" -> "100")).isEmpty)
    val lin = s.read.parquet(s"$store/lineage")
      .agg(count(lit(1)), sum("rawBytes"), sum("encodedBytes")).collect()(0)
    assert(lin.getLong(0) > 0 && lin.getLong(2) < lin.getLong(1))
    // missing required flags throw (catchable), never sys.exit
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "searchenc", store, Map.empty)
    }
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "encode", s"$in/rows.parquet", Map.empty)
    }

    val ds = graft.synth.TokenSynth.dataset(s, 400).collect()
    def brute(lo: Int, hi: Int) =
      ds.map(_.tokens.count(v => v >= lo && v <= hi).toLong).sum
    val n = UndatumCli.run(s, "countenc", store,
      Map("lo" -> "100", "hi" -> "300")).get.collect()(0).getLong(0)
    assert(n == brute(100, 300))
    val hits = UndatumCli.run(s, "searchenc", store,
      Map("lo" -> "100", "hi" -> "300")).get
      .agg(org.apache.spark.sql.functions.sum("n_hits"))
      .collect()(0).getLong(0)
    assert(hits == brute(100, 300))
    val freqTotal = UndatumCli.run(s, "frequencyenc", store, Map.empty).get
      .agg(org.apache.spark.sql.functions.sum("n_occ"))
      .collect()(0).getLong(0)
    assert(freqTotal == ds.map(_.tokens.length.toLong).sum)
    val back = UndatumCli.run(s, "decode", store, Map.empty).get
    assert(back.count() == 400)
    // phrase + conjunctive search against a brute replay of the synth
    val ph = Array(27063, 19039, 11004) // synth phrase #0 ("web")
    val bruteP = ds.map { r =>
      (0 to r.tokens.length - 3)
        .count(i => r.tokens(i) == ph(0) && r.tokens(i + 1) == ph(1) &&
          r.tokens(i + 2) == ph(2)).toLong
    }.sum
    assert(bruteP > 0)
    val gotP = UndatumCli.run(s, "phraseenc", store,
      Map("tokens" -> "27063,19039,11004")).get
      .agg(org.apache.spark.sql.functions.sum("n_matches"))
      .collect()(0).getLong(0)
    assert(gotP == bruteP)
    val cj = Array(544938, 424295, 624351) // "news" lowcard vocab
    val bruteC = ds.count(r => cj.forall(r.tokens.contains)).toLong
    assert(bruteC > 0)
    assert(UndatumCli.run(s, "conjenc", store,
      Map("tokens" -> "544938,424295,624351")).get.count() == bruteC)
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "phraseenc", store, Map.empty)
    }
    // proximity: docs where phrase #0's first/last tokens sit within
    // the window — brute replay over the raw rows
    val (na, nb, nw) = (27063, 11004, 4)
    val bruteN = ds.count { r =>
      val pa = r.tokens.indices.filter(r.tokens(_) == na)
      val pb = r.tokens.indices.filter(r.tokens(_) == nb)
      pa.exists(i => pb.exists(j => math.abs(i - j) <= nw))
    }.toLong
    assert(bruteN > 0)
    assert(UndatumCli.run(s, "nearenc", store,
      Map("tokens" -> s"$na,$nb", "window" -> nw.toString)).get
      .count() == bruteN)
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "nearenc", store, Map("tokens" -> "1,2,3"))
    }
    // per-codec store stats from metadata only: mass conserved, every
    // codec id resolves to a name, payload column never projected
    val statDf = UndatumCli.run(s, "statenc", store, Map.empty).get
    val stats = statDf.collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == ds.length.toLong)
    assert(stats.map(_.getAs[Long]("n_tokens")).sum ==
      ds.map(_.n_tok.toLong).sum)
    assert(stats.forall(_.getAs[String]("codec") != "?"))
    assert(stats.forall(_.getAs[Double]("ratio") > 0.0))
    val statPlan = statDf.queryExecution.executedPlan.toString
    assert(!statPlan.contains("payload"),
      s"storeStats must not project the payload column:\n$statPlan")
    // --by-source splits the same mass per source; driftenc returns
    // one micro-nat KL row per source
    val bySrc = UndatumCli.run(s, "frequencyenc", store,
      Map("by-source" -> "1")).get
    assert(bySrc.columns.toSeq == Seq("source", "token", "n_occ"))
    assert(bySrc.agg(org.apache.spark.sql.functions.sum("n_occ"))
      .collect()(0).getLong(0) == freqTotal)
    val nSources = ds.map(_.source).distinct.length
    val drift = UndatumCli.run(s, "driftenc", store, Map.empty).get.collect()
    assert(drift.length == nSources &&
      drift.forall(_.getAs[Long]("kl_micro") >= 0L))
    // bloom point lookup returns exactly the requested docs
    val twoIds = ds.map(_.doc_id).sorted.take(2)
    val looked = UndatumCli.run(s, "getenc", store,
      Map("doc" -> twoIds.mkString(","))).get.collect()
    assert(looked.map(_.getAs[String]("doc_id")).toSeq == twoIds.toSeq)
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "getenc", store, Map.empty)
    }
    // unigram-LM scoring: one row per doc, worst (highest mean NLL) first
    val ppl = UndatumCli.run(s, "perplexenc", store,
      Map("topk" -> "16")).get.collect()
    assert(ppl.length == ds.length)
    val means = ppl.map(_.getAs[Long]("mean_nll_micro")).toSeq
    assert(means == means.sortBy(-_))
    // bigram frequency conserves total transition mass
    val biTotal = UndatumCli.run(s, "bigramenc", store, Map.empty).get
      .agg(org.apache.spark.sql.functions.sum("n_occ"))
      .collect()(0).getLong(0)
    assert(biTotal == ds.map(r => math.max(r.n_tok - 1, 0).toLong).sum)
    // PMI collocations: bounded top-k, scores non-increasing
    val pmi = UndatumCli.run(s, "pmienc", store,
      Map("topk" -> "10", "min-count" -> "2")).get.collect()
    assert(pmi.length <= 10 && pmi.nonEmpty)
    val pmis = pmi.map(_.getAs[Long]("pmi_micro")).toSeq
    assert(pmis == pmis.sortBy(-_))
    // KN scoring: one row per doc, worst first
    val kn = UndatumCli.run(s, "knenc", store,
      Map("pairs" -> "64")).get.collect()
    assert(kn.length == ds.length)
    val knMeans = kn.map(_.getAs[Long]("ppl_micro")).toSeq
    assert(knMeans == knMeans.sortBy(-_))
    // quality-gated rewrite writes a NEW store (returns None, like
    // encode, so the generic --output epilogue can't clobber it) that
    // decodes to a strict nonempty subset
    val curated = s"${tmpDir("cli-curated")}/store"
    assert(UndatumCli.run(s, "curateenc", store,
      Map("output" -> curated, "max-nll" -> "7000000",
        "rows-per-part" -> "100")).isEmpty)
    val curBack = UndatumCli.run(s, "decode", curated, Map.empty).get.collect()
    assert(curBack.nonEmpty && curBack.length < 400)
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "curateenc", store, Map.empty)
    }
    // surgical delete store->store (API covered in PipelineSpec; this
    // is the CLI wiring + fresh-dir flag contract)
    val delStore = s"${tmpDir("cli-deleted")}/store"
    val victim = curBack.map(_.getAs[String]("doc_id")).min
    assert(UndatumCli.run(s, "deleteenc", curated,
      Map("output" -> delStore, "doc" -> victim)).isEmpty)
    val delBack = UndatumCli.run(s, "decode", delStore, Map.empty).get
      .select("doc_id").collect().map(_.getString(0))
    assert(delBack.length == curBack.length - 1 && !delBack.contains(victim))
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "deleteenc", curated, Map("output" -> delStore))
    }
    // store union: curated + deleted merge back (plans differ — the
    // curate and delete rewrites each pinned their own — so this
    // exercises the CLI's re-encode arm; the zero-decode row-level arm
    // is API-covered in PipelineSpec). Duplicates are preserved:
    // every doc in BOTH inputs appears twice.
    val mergedStore = s"${tmpDir("cli-merged")}/store"
    assert(UndatumCli.run(s, "mergeenc", curated,
      Map("with" -> delStore, "output" -> mergedStore)).isEmpty)
    val mBack = UndatumCli.run(s, "decode", mergedStore, Map.empty).get
      .select("doc_id").collect().map(_.getString(0))
    assert(mBack.length == curBack.length + delBack.length)
    assert(mBack.count(_ == victim) == 1)
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "mergeenc", curated, Map("output" -> mergedStore))
    }
    // compaction: the merged store re-encoded under one fresh plan, so
    // nothing is fragmented — the CLI must report zero re-encodes and
    // the compacted store must decode identically (wiring + fresh-dir
    // contract; the fragmented paths are API-covered in PipelineSpec)
    val compactStore = s"${tmpDir("cli-compacted")}/store"
    assert(UndatumCli.run(s, "compactenc", mergedStore,
      Map("output" -> compactStore)).isEmpty)
    val cBack = UndatumCli.run(s, "decode", compactStore, Map.empty).get
      .select("doc_id").collect().map(_.getString(0))
    assert(cBack.sorted.toSeq == mBack.sorted.toSeq)
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "compactenc", mergedStore,
        Map("output" -> compactStore))
    }
    // integrity fsck: the compacted store audits clean in verify mode
    val audit = UndatumCli.run(s, "auditenc", compactStore,
      Map("mode" -> "verify")).get.collect()
    assert(audit.nonEmpty && audit.forall(_.getAs[Boolean]("ok")))
    assert(audit.map(_.getAs[Long]("rows_blocks")).sum == cBack.length.toLong)
    // token-bloom index: build is idempotent, search stays exact after
    val preIdx = UndatumCli.run(s, "searchenc", compactStore,
      Map("lo" -> "5", "hi" -> "5")).get.collect().toSeq
    assert(UndatumCli.run(s, "indexenc", compactStore, Map.empty).isEmpty)
    assert(UndatumCli.run(s, "searchenc", compactStore,
      Map("lo" -> "5", "hi" -> "5")).get.collect().toSeq == preIdx)
    // re-plan rewrite (overflow-skew repair): fresh plan, same content
    val recoded = s"${tmpDir("cli-recoded")}/store"
    assert(UndatumCli.run(s, "recodeenc", compactStore,
      Map("output" -> recoded, "rows-per-part" -> "200")).isEmpty)
    val rBack = UndatumCli.run(s, "decode", recoded, Map.empty).get
      .select("doc_id").collect().map(_.getString(0))
    assert(rBack.sorted.toSeq == cBack.sorted.toSeq)
    intercept[IllegalArgumentException] {
      UndatumCli.run(s, "recodeenc", compactStore, Map("output" -> recoded))
    }
  }

  test("schema: per-field layout plus xxhash64 identity key") {
    val s = spark
    val p = writeCsv()
    val rows = UndatumCli.run(s, "schema", p, Map.empty).get.collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("field")).toSet ==
      Set("name", "lang", "age", "email"))
    assert(rows.forall(_.getAs[Boolean]("is_flat")))
    assert(rows.forall(r => r.getAs[Int]("num_cols") == 4))
    // the key matches the engine's schema fingerprint definition
    val expected = graft.operators.Analyzer
      .schemaFingerprint(s.read.option("header", "true").csv(p))
      .collect()(0).getAs[Long]("schema_key")
    assert(rows.forall(_.getAs[Long]("schema_key") == expected))
  }

  test("schema_bulk groups a mixed-schema directory by fingerprint (distinct + perfile)") {
    val s = spark
    val dir = tmpDir("cli-bulk")
    // two csv files sharing one schema, one jsonl with another, plus a
    // file of an unrecognized extension that must be skipped
    def put(name: String, lines: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(s"$dir/$name", "UTF-8")
      lines.foreach(w.println); w.close()
    }
    put("a.csv", Seq("x,y", "1,2", "3,4"))
    put("b.csv", Seq("y,x", "5,6", "7,8")) // same fields, other order
    put("c.jsonl", Seq("""{"x":1,"z":"q"}""", """{"x":2,"z":"r"}"""))
    put("d.txt", Seq("ignored"))
    val distinct = UndatumCli.run(s, "schema_bulk", dir, Map.empty).get
      .orderBy("schema_key").collect()
    assert(distinct.length == 2)
    val byFields = distinct.map(r =>
      r.getAs[String]("fields") ->
        r.getAs[scala.collection.Seq[String]]("files").toSeq).toMap
    assert(byFields("x|y") == Seq("a.csv", "b.csv")) // sorted-name key
    assert(byFields("x|z") == Seq("c.jsonl"))
    assert(distinct.forall(_.getAs[Long]("n_files") > 0))
    val perfile = UndatumCli.run(s, "schema_bulk", dir,
      Map("mode" -> "perfile")).get.collect()
    assert(perfile.map(_.getAs[String]("file")).toSeq ==
      Seq("a.csv", "b.csv", "c.jsonl"))
    // per-file keys agree with the distinct grouping
    val keyOf = perfile.map(r =>
      r.getAs[String]("file") -> r.getAs[Long]("schema_key")).toMap
    assert(keyOf("a.csv") == keyOf("b.csv") && keyOf("a.csv") != keyOf("c.jsonl"))
  }

  test("schema_bulk distinct: one row per key even when flatness differs; nested num_cols") {
    val s = spark
    val dir = tmpDir("cli-bulk2")
    def put(name: String, lines: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(s"$dir/$name", "UTF-8")
      lines.foreach(w.println); w.close()
    }
    // same leaf path "x", different shapes: scalar vs array — ONE
    // distinct row (the reference groups purely by the name-hash key),
    // is_flat reported as the conjunction
    put("scalar.jsonl", Seq("""{"x":1}""", """{"x":2}"""))
    put("arr.jsonl", Seq("""{"x":[1,2]}"""))
    val distinct = UndatumCli.run(s, "schema_bulk", dir, Map.empty).get.collect()
    assert(distinct.length == 1)
    assert(distinct(0).getAs[Long]("n_files") == 2L)
    assert(!distinct(0).getAs[Boolean]("is_flat"))
    // nested file: schema and schema_bulk agree on num_cols = leaf paths
    put("nested.jsonl", Seq("""{"a":{"b":1,"c":2}}"""))
    val one = UndatumCli.run(s, "schema", s"$dir/nested.jsonl", Map.empty)
      .get.collect()
    assert(one.forall(_.getAs[Int]("num_cols") == 2))
    val pf = UndatumCli.run(s, "schema_bulk", dir, Map("mode" -> "perfile"))
      .get.collect().map(r => r.getAs[String]("file") -> r.getAs[Int]("num_cols")).toMap
    assert(pf("nested.jsonl") == 2)
  }
}
