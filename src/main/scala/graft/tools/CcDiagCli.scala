package graft.tools

import org.apache.spark.sql.SparkSession

import graft.dedup.Dedup

/** Sweep/round diagnostic for the two connected-components forms on a
  * real corpus — makes the default-vs-star choice data-driven
  * (VERDICT r4 #7). Builds the SAME near-dup edge set as
  * q_dedup_clusters (2-shingle Jaccard ≥ 0.05 within source blocks on
  * the documents table), then runs label propagation
  * ([[Dedup.connectedComponentsCounted]]) and alternating star
  * contraction ([[Dedup.connectedComponentsStarCounted]]) and prints
  * ONE JSON line: edge count, per-form sweeps/rounds + wall seconds +
  * component count.
  *
  * Reading the output: propagation's sweep count ≈ max component
  * diameter + 1 (the convergence-proof sweep); near-dup graphs are
  * dense clumps, so 2-4 sweeps is the expected regime and propagation
  * (one shuffle per sweep) stays the right default. If a corpus
  * reports sweeps within 2 of maxIter, or a hot vertex makes
  * per-sweep reduce groups skew-bound, the star form's O(log²n)
  * rounds win — switch `ccForm` accordingly.
  *
  * Usage: runMain graft.tools.CcDiagCli <sfDir> [threshold]
  */
object CcDiagCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CcDiagCli <sfDir> [threshold]")
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.05
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft-ccdiag-stage-" +
        java.lang.Integer.toHexString(sfDir.hashCode) // concurrent runs on different corpora must not share a stage
      val pairs = Dedup.jaccardWithinStaged(docs, "doc_id", "text",
        "source", stage, shingleN = 2, threshold = threshold)
        .persist()
      val nEdges = pairs.count()
      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val ((propLabels, propSweeps), propSecs) =
        time(Dedup.connectedComponentsCounted(pairs))
      val propComponents = propLabels.select("cluster").distinct().count()
      val ((starLabels, starRounds), starSecs) =
        time(Dedup.connectedComponentsStarCounted(pairs))
      val starComponents = starLabels.select("cluster").distinct().count()
      pairs.unpersist(blocking = false)
      require(propComponents == starComponents,
        s"forms disagree: $propComponents vs $starComponents components")
      println(
        f"""{"edges":$nEdges,"prop_sweeps":$propSweeps,"prop_secs":$propSecs%.2f,"star_rounds":$starRounds,"star_secs":$starSecs%.2f,"components":$propComponents,"threshold":$threshold,"sf":"$sfDir"}""")
    } finally spark.stop()
  }
}
