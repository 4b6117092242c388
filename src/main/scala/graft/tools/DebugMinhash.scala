package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for the minhash pipeline at a given sf. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-dbg")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DBG $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    graft.functions.MinHashSig.register(spark)
    val withSig = docs
      .select(col("doc_id").as("id"), col("text"))
      .withColumn("sh", graft.dedup.Dedup.shingles(col("text"), 2))
      .where(size(col("sh")) > 0)
      .withColumn("sig", graft.functions.MinHashSig.minhashSig(col("sh")))
    timed("shingles only")(docs.select(
      graft.dedup.Dedup.shingles(col("text"), 2).as("sh"))
      .agg(sum(size(col("sh")))).collect())
    timed("withSig count")(withSig.count())
    timed("withSig sig checksum")(withSig.select(
      sum(element_at(col("sig"), 1))).collect())
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(31)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b.cast("int") * 2 + 1, lit(2)))))))
    timed("banded count")(banded.count())
    val nocap = timed("candidates(no prefilter)") {
      graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 2, k = 64, bands = 0, threshold = 0.3,
        estMargin = -1).count()
    }
    println(s"DBG n_cand_raw=$nocap")
    val cand = timed("candidates(prefilter)") {
      graft.dedup.Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 2, k = 64, bands = 0, threshold = 0.3).count()
    }
    println(s"DBG n_cand_filtered=$cand")
    val full = timed("full pairs") {
      graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 2, k = 64, bands = 0, threshold = 0.3).count()
    }
    println(s"DBG n_pairs=$full")
    spark.stop()
  }
}
