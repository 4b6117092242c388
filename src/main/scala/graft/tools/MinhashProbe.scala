package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-by-stage noop timing of the minhash near-dup pipeline
  * (q_minhash_pairs): runMain graft.dedup.MinhashProbe <sfDir>
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.tools.Sessions.create("graft-mh-probe", defaultCpus = "32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val stage = java.nio.file.Files.createTempDirectory("mh-probe").toString

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

    // a: signatures + stage write (stageSignatures is the public entry)
    time("signatures+stage write") {
      Dedup.stageSignatures(docs, "doc_id", "text", 2, s"$stage/st")
      ()
    }
    val staged = spark.read.parquet(s"$stage/st")
    // c: banding + cap + self-join + dedup, NO estimate pre-filter
    time("cand(no prefilter)") {
      noop(Dedup.minhashCandidatesSigned(staged, k = 64, bands = 0,
        threshold = 0.3, estMargin = -1))
    }
    // d: candidates incl the sig-agree pre-filter
    time("cand(+sig prefilter)") {
      noop(Dedup.minhashCandidatesSigned(staged, k = 64, bands = 0,
        threshold = 0.3))
    }
    // e: full verify
    time("verify(full)") {
      noop(Dedup.minhashVerifyShingled(staged,
        Dedup.minhashCandidatesSigned(staged, k = 64, bands = 0, threshold = 0.3),
        threshold = 0.3))
    }
    // volumetrics: how much work the banding actually materializes
    val nDocs = staged.count()
    val bands = Dedup.bandsForThreshold(64, 0.3)
    val diag = Dedup.minhashBucketDiag(docs, "doc_id", "text",
      shingleN = 2, k = 64, threshold = 0.3).collect()(0)
    println(s"DIAG docs=$nDocs bands=$bands bucketStats=$diag")
    val nCand = Dedup.minhashCandidatesSigned(staged, k = 64, bands = 0,
      threshold = 0.3, estMargin = -1).count()
    val nCandPre = Dedup.minhashCandidatesSigned(staged, k = 64, bands = 0,
      threshold = 0.3).count()
    println(s"DIAG cand_raw=$nCand cand_prefiltered=$nCandPre")
    spark.stop()
  }
}
