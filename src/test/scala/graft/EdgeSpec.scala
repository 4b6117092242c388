package graft

import org.apache.spark.sql.functions._

/** Degenerate-input hardening: empty tables and header-only files
  * through the profile/render/analyze surface.
  */
class EdgeSpec extends SparkSpecBase {

  test("report and renderReport survive an empty table") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("name", "n")
    val rep = graft.operators.Analyzer.report(empty).collect()
    assert(rep.length == 2) // one row per field, zero totals
    assert(rep.forall(_.getAs[Long]("total") == 0L))
    // all three render modes produce output without throwing
    for (mode <- Seq("text", "json", "yaml")) {
      val out = graft.operators.Analyzer.renderReport(empty, mode)
      assert(out.nonEmpty, mode)
    }
  }

  test("analyzeFile handles a header-only csv") {
    val dir = tmpDir("graft-headeronly")
    val f = s"$dir/h.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f), "id,name\n")
    val a = graft.operators.Analyzer.analyzeFile(spark, f)
    assert(a.format == "csv" && a.df.count() == 0)
    assert(a.df.columns.toSeq == Seq("id", "name"))
    assert(a.render("text").nonEmpty)
  }

  test("packing and quantiles over empty inputs yield empty results") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long, Long)].toDF("src", "id", "n")
    assert(graft.encode.Packing.packSequences(empty, "id", "n", "src", 16)
      .count() == 0)
    assert(graft.encode.Packing.packingStats(empty, "id", "n", "src", 16)
      .count() == 0)
  }

  test("connectedComponents over an empty pair set is empty") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.dedup.Dedup.connectedComponents(none).count() == 0)
  }

  test("cosine LSH candidate generation over an empty corpus is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Array[Float])]
      .toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    assert(graft.sim.Similarity.cosineLshCandidates(
      empty, "embedding", "vec_id", "label").count() == 0)
    assert(graft.sim.Similarity.cosinePairsLsh(
      empty, "embedding", "vec_id", "label", 0.5).count() == 0)
  }

  test("encode of an empty dataset completes and decodes to empty") {
    import spark.implicits._
    val empty = spark.emptyDataset[graft.model.TokenRow]
    val out = tmpDir("graft-empty-enc")
    val lineage = graft.encode.TokenEncoder.run(empty, out,
      graft.encode.TokenEncoder.EncodeConfig(targetRowsPerPart = 100))
    assert(lineage.count() == 0)
    // a second run is a committed no-op, and reading back yields empty
    assert(graft.encode.TokenEncoder.run(empty, out,
      graft.encode.TokenEncoder.EncodeConfig(targetRowsPerPart = 100)).count() == 0)
  }

  test("rangeJoin with no intervals returns no rows") {
    import spark.implicits._
    val pts = Seq(("k", 1L, 5L)).toDF("k", "pid", "t")
    val none = Seq.empty[(String, Long, Long)].toDF("k", "s", "e")
    assert(graft.operators.RangeJoin.rangeJoin(pts, none, "t", "s", "e",
      10, Seq("k")).count() == 0)
  }
}
