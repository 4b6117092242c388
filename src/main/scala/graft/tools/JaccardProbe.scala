package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-by-stage noop timing of the exact-jaccard near-dup pipeline
  * (q_jaccard_within / q_dedup_clusters): runMain graft.dedup.JaccardProbe <sfDir>
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.tools.Sessions.create("graft-jacc-probe", defaultCpus = "32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("jacc-probe").toString

    def time(name: String)(body: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s cold=${ts(0)}%6.2fs warm=${ts(1)}%6.2fs")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    graft.functions.Shingles.register(spark)
    // a: shingle compute only
    time("shingle(compute)") {
      noop(docs.select(col("source").as("blk0"), col("doc_id").as("id"),
        graft.functions.Shingles.shinglesNative(col("text"), 2).as("sh")))
    }
    // b: shingle + stage parquet write
    time("shingle+stage write") {
      docs.select(col("source").as("blk0"), col("doc_id").as("id"),
          graft.functions.Shingles.shinglesNative(col("text"), 2).as("sh"))
        .write.mode("overwrite").parquet(s"$stage/st")
    }
    val blk0 = spark.read.parquet(s"$stage/st")
    // c: full verify off the stage
    time("blocked verify(all)") {
      noop(Dedup.jaccardWithinShingled(blk0, 0.05, lengthBucket = true))
    }
    // d: CC on top (the q_dedup_clusters delta)
    time("cc(on pairs)") {
      noop(Dedup.connectedComponents(
        Dedup.jaccardWithinShingled(blk0, 0.05, lengthBucket = true)))
    }
    spark.stop()
  }
}
