package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.sources.WarcLocal

/** WARC/WET source+sink: hand-built wire fixtures (the interop anchor
  * — no warc library exists in this sandbox), length-delimited payload
  * discipline, HTTP header stripping, folded headers, gzip
  * multi-member reads, the distributed round trip, and truncation
  * diagnostics.
  */
class WarcSpec extends SparkSpecBase {

  private def rec(headers: Seq[(String, String)], payload: String): String = {
    val p = payload.getBytes(UTF_8)
    "WARC/1.0\r\n" +
      headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      s"Content-Length: ${p.length}\r\n\r\n" + payload + "\r\n\r\n"
  }

  test("parses hand-built WET records; payload containing CRLFCRLF+WARC/ survives") {
    // the second record's payload embeds a fake record start — only
    // Content-Length-driven parsing reads this correctly
    val tricky = "line one\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\nnot a record"
    val fixture =
      rec(Seq("WARC-Type" -> "warcinfo", "Content-Type" -> "application/warc-fields"),
        "software: graft\r\n") +
      rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://example.org/a",
          "WARC-Date" -> "2024-01-01T00:00:00Z",
          "Content-Type" -> "text/plain"), tricky) +
      rec(Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> "http://example.org/b",
          "Content-Type" -> "text/plain"), "second doc")
    val rows = WarcLocal.parseFile("fix.warc", fixture.getBytes(UTF_8)).toList
    assert(rows.map(_.warc_type) == List("warcinfo", "conversion", "conversion"))
    assert(rows(1).text == tricky)
    assert(rows(1).target_uri == "http://example.org/a")
    assert(rows(1).warc_date == "2024-01-01T00:00:00Z")
    assert(rows(2).text == "second doc")
  }

  test("strips HTTP headers from application/http response payloads") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>body</html>"
    val fixture = rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "http://example.org/h",
      "Content-Type" -> "application/http; msgtype=response"), http)
    val b = fixture.getBytes(UTF_8)
    val stripped = WarcLocal.parseFile("f.warc", b).toList.head
    assert(stripped.text == "<html>body</html>")
    // content_length still reports the full payload (wire truth)
    assert(stripped.content_length == http.getBytes(UTF_8).length.toLong)
    val rawRow = WarcLocal.parseFile("f.warc", b, stripHttp = false).toList.head
    assert(rawRow.text == http)
  }

  test("folded header continuation and case-insensitive names") {
    val payload = "x"
    val fixture = "WARC/1.0\r\n" +
      "warc-type: conversion\r\n" +
      "WARC-Target-URI: http://example.org/\r\n" +
      "\t long-tail\r\n" +
      s"CONTENT-LENGTH: 1\r\n\r\n$payload\r\n\r\n"
    val r = WarcLocal.parseFile("f.warc", fixture.getBytes(UTF_8)).toList.head
    assert(r.warc_type == "conversion")
    assert(r.target_uri == "http://example.org/ long-tail")
    assert(r.text == "x")
  }

  test("negative Content-Length fails with the parser diagnostic, not a raw slice error") {
    val neg = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: -5\r\n\r\nxxxxx\r\n\r\n").getBytes(UTF_8)
    val e = intercept[IllegalArgumentException] {
      WarcLocal.parseFile("neg.warc", neg).toList
    }
    assert(e.getMessage.contains("negative Content-Length"))
  }

  test("header values with CR/LF are sanitized on write — no record injection") {
    val rec2 = WarcLocal.encodeRecord(
      "http://x/\r\nWARC-Type: evil", "2024-01-01T00:00:00Z", "payload")
    val rows = WarcLocal.parseFile("inj.warc", rec2).toList
    assert(rows.length == 1)
    assert(rows.head.warc_type == "conversion") // not "evil"
    assert(rows.head.target_uri == "http://x/  WARC-Type: evil")
    assert(rows.head.text == "payload")
  }

  test("truncated payload and missing Content-Length fail with file context") {
    val trunc = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 999\r\n\r\nshort").getBytes(UTF_8)
    val e1 = intercept[IllegalArgumentException] {
      WarcLocal.parseFile("bad.warc", trunc).toList
    }
    assert(e1.getMessage.contains("bad.warc") && e1.getMessage.contains("truncated"))
    val noLen = "WARC/1.0\r\nWARC-Type: conversion\r\n\r\n".getBytes(UTF_8)
    val e2 = intercept[IllegalArgumentException] {
      WarcLocal.parseFile("nolen.warc", noLen).toList
    }
    assert(e2.getMessage.contains("Content-Length"))
  }

  test("distributed round trip: multi-partition gz write, per-record members, read back") {
    val s = spark
    import s.implicits._
    val docs = (0 until 200).map { i =>
      (s"http://example.org/doc/$i", "2024-01-01T00:00:00Z",
        s"doc $i body\nwith a second line, unicode é中, and trailing space ")
    }.toDF("target_uri", "warc_date", "text").repartition(4)
    val dir = tmpDir("warc-rt") + "/wet"
    WarcLocal.write(docs, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 4, s"expected 4 part files, got ${files.length}")
    // the task-commit protocol leaves no attempt temps behind
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))
    val back = WarcLocal.read(s, s"$dir/*.warc.gz")
    assert(back.count() == 200)
    val got = back.select("target_uri", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    docs.collect().foreach { r =>
      assert(got(r.getString(0)) == r.getString(2), r.getString(0))
    }
    // every record is its own gzip member: byte 0 of each file is the
    // gzip magic, and the file holds as many members as records
    val sample = java.nio.file.Files.readAllBytes(files.head.toPath)
    assert((sample(0) & 0xff) == 0x1f && (sample(1) & 0xff) == 0x8b)
    var members = 0
    var i = 0
    while (i + 1 < sample.length) {
      if ((sample(i) & 0xff) == 0x1f && (sample(i + 1) & 0xff) == 0x8b &&
          (sample(i + 2) & 0xff) == 0x08) members += 1
      i += 1
    }
    assert(members >= 40, s"expected ~50 members, found $members") // 200/4 records
  }

  test("streaming source ingests dropped shards once each, no re-reads on restart-equivalents") {
    val s = spark
    import s.implicits._
    val drop = tmpDir("warc-stream") + "/drop"
    new java.io.File(drop).mkdirs()
    def writeShard(n: Int, ids: Range, ext: String = "warc.gz"): Unit = {
      val docs = ids.map(i =>
        (s"http://example.org/doc/$i", "2024-01-01T00:00:00Z", s"doc $i body"))
        .toDF("target_uri", "warc_date", "text").coalesce(1)
      val tmp = tmpDir(s"warc-shard$n") + "/w"
      WarcLocal.write(docs, tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).head
      java.nio.file.Files.move(f.toPath,
        new java.io.File(drop, f"shard-$n%03d.$ext").toPath)
      ()
    }
    writeShard(1, 0 until 5)
    val q = WarcLocal.readStream(s, drop)
      .writeStream.format("memory").queryName("warcstream")
      .option("checkpointLocation", tmpDir("warc-ckpt"))
      .start()
    def n(): Long =
      s.sql("SELECT count(*) FROM warcstream").collect()(0).getLong(0)
    try {
      q.processAllAvailable()
      assert(n() == 5)
      writeShard(2, 5 until 12) // a later crawl drop
      q.processAllAvailable()
      assert(n() == 12)
      q.processAllAvailable() // no new files -> no duplicates
      assert(n() == 12)
      // CC WET shards are routinely named *.wet.gz — the default glob
      // must pick them up too (a warc-only glob streamed them as zero
      // rows with no error)
      writeShard(3, 12 until 15, ext = "wet.gz")
      q.processAllAvailable()
      assert(n() == 15)
      val uris = s.sql("SELECT target_uri FROM warcstream")
        .collect().map(_.getString(0)).toSet
      assert(uris.size == 15 && uris.contains("http://example.org/doc/11") &&
        uris.contains("http://example.org/doc/14"))
    } finally q.stop()
  }

  test("WET drop dir -> gate -> tokenize -> exactly-once columnar encode, decoded equal") {
    // the full crawl-ingest composition: a crawler drops .warc.gz
    // shards; the stream parses records, quality-gates, tokenizes
    // against a fixed vocab and lands in the encoded store through
    // the commit-marker exactly-once path
    val s = spark
    import s.implicits._
    val drop = tmpDir("wet-ingest") + "/drop"
    new java.io.File(drop).mkdirs()
    val texts = (0 until 20).map(i => s"alpha beta doc$i gamma alpha")
    val docs = texts.zipWithIndex.map { case (t2, i) =>
      (s"http://example.org/doc/$i", "2024-01-01T00:00:00Z", t2)
    }.toDF("target_uri", "warc_date", "text")
    WarcLocal.write(docs.coalesce(1), drop) // one shard file
    val vocab = graft.text.TextOps.buildVocab(
      texts.zipWithIndex.map { case (t2, i) => (i.toLong, t2, "wet") }
        .toDF("doc_id", "text", "source"), "text", 8)
    val outDir = tmpDir("wet-ingest-out")
    val stream = WarcLocal.readStream(s, drop)
      .select(regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).as("doc_id"),
        col("text"), lit("wet").as("source"))
    val q = graft.streaming.EncodeStream.streamingTextIngest(
      stream, vocab, outDir, oovId = 8, minQualityBp = 0L,
      graft.encode.TokenEncoder.EncodeConfig(targetRowsPerPart = 8))
    try q.processAllAvailable() finally q.stop()
    val back = graft.streaming.EncodeStream.readAll(s, outDir,
        verifyChecksums = true)
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(back.size == 20)
    // batch-side tokenize over the SAME vocab is the expected value
    val expect = graft.text.TextOps.tokenize(
        texts.zipWithIndex.map { case (t2, i) => (i.toLong, t2, "wet") }
          .toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", vocab, 8)
      .collect().map(r => r.getAs[String]("doc_id") ->
        r.getAs[Seq[Int]]("tokens")).toMap
    assert(back == expect)
  }

  test("Converter dispatch: wet sink + source with warc-type filter") {
    val s = spark
    import s.implicits._
    val docs = Seq(("http://example.org/1", "2024-01-01T00:00:00Z", "alpha"),
      ("http://example.org/2", "2024-01-01T00:00:00Z", "beta"))
      .toDF("target_uri", "warc_date", "text")
    val dir = tmpDir("warc-conv") + "/out"
    graft.sources.Converter.write(docs, dir, "wet")
    val back = graft.sources.Converter.read(s, s"$dir/*.warc.gz",
      graft.sources.Converter.ReadOptions("wet", tagname = "conversion"))
    assert(back.where(col("warc_type") === "conversion").count() == 2)
    assert(back.select(min("text")).collect()(0).getString(0) == "alpha")
  }
}
