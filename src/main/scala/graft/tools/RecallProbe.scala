package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.{Ivf, Recall, Similarity}

/** Sweep ANN settings (LSH nPlanes/probing, IVF k/nprobe) and print
  * measured recall@10 vs the exact brute baseline — the evidence
  * behind the default settings `Bench` reports as `ann_recall_*`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .where(col("embedding").isNotNull).cache()
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    println(s"corpus rows=$n dim=$dim")
    val queries = Recall.sampleQueries(emb, "embedding", "vec_id", 32)
    val truth = Recall.truthAtK(emb, "embedding", "vec_id", queries, 10)

    for (nPlanes <- Seq(4, 6, 8); radius <- 0 to 2) {
      val got = queries.map { case (qid, qv) =>
        qid -> Similarity.annTopK(emb, "embedding", "vec_id", qv, 10,
            nPlanes = nPlanes, probeRadius = radius)
          .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
      }.toMap
      // scanned fraction: mean bucket-restricted scan size / corpus
      val frac = queries.map { case (_, qv) =>
        Similarity.annScan(emb, "embedding", qv, nPlanes,
          probeRadius = radius).count().toDouble / n
      }.sum / queries.size
      println(f"LSH nPlanes=$nPlanes radius=$radius recall=${Recall.recallOf(truth, got)}%.3f scanned=$frac%.3f")
    }

    for (k <- Seq(8, 16); nprobe <- Seq(1, 2, 4)) {
      val idx = Ivf.train(emb, "embedding", k = k)
      val assigned = Ivf.assign(emb, "embedding", idx).cache()
      val got = Ivf.searchBatch(assigned, "embedding", "vec_id", idx, queries, 10, nprobe = nprobe)
        .select(col("qid"), col("vec_id").cast("long").as("id"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val frac = nprobe.toDouble / k
      println(f"IVF k=$k nprobe=$nprobe recall=${Recall.recallOf(truth, got)}%.3f cellfrac=$frac%.3f")
      assigned.unpersist()
    }
    spark.stop()
  }
}
