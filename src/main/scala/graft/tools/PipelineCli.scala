package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.encode.{TokenDecoder, TokenEncoder}
import graft.synth.TokenSynth

/** End-to-end pipeline demo: synth -> encode (auto codec, salted
  * partitions, lineage) -> decode -> verify equality + report ratios.
  *   sbt "runMain graft.tools.PipelineCli [nRows] [outDir]"
  * Passing the same outDir twice exercises resume/idempotency (second
  * run should encode 0 new partitions).
  */
object PipelineCli {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toLong else 20000L
    val spark = Sessions.create("graft-pipeline")
    import spark.implicits._

    val outDir =
      if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-enc").toString
    val t0 = System.nanoTime()
    val ds = TokenSynth.dataset(spark, nRows)
    val lineage = TokenEncoder.run(ds, outDir)
    println(s"outDir=$outDir blocks_encoded_this_run=${lineage.count()}")
    val agg = lineage.groupBy("codecId").agg(
      count("*").as("blocks"), sum("rawBytes").as("raw"),
      sum("encodedBytes").as("enc"), sum("totalTokens").as("tokens")
    ).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    var raw = 0L; var enc = 0L; var toks = 0L
    agg.foreach { r =>
      raw += r.getLong(2); enc += r.getLong(3); toks += r.getLong(4)
      println(f"codec=${graft.codec.CodecIds.names(r.getInt(0))}%-8s blocks=${r.getLong(1)}%4d " +
        f"raw=${r.getLong(2)}%12d enc=${r.getLong(3)}%12d ratio=${r.getLong(2).toDouble / math.max(1, r.getLong(3))}%7.2fx")
    }
    println(f"TOTAL raw=$raw enc=$enc ratio=${raw.toDouble / math.max(1, enc)}%.2fx " +
      f"tokens=$toks encode_secs=$secs%.1f tokens_per_sec=${toks / secs}%.0f")

    // round-trip: decoded table must equal the source table
    // (checksum-verified read: corruption fails loudly, per block)
    val back = TokenDecoder.read(spark, outDir, verifyChecksums = true)
    val orig = ds.select($"doc_id", $"tokens", $"n_tok", $"source")
    val dec = back.select($"doc_id", $"tokens", $"n_tok", $"source")
    val mism = orig.exceptAll(dec).count() + dec.exceptAll(orig).count()
    println(s"mismatched_rows=$mism")
    println(if (mism == 0) "ROUNDTRIP-OK" else "ROUNDTRIP-FAIL")
    spark.stop()
    if (mism != 0) sys.exit(1)
  }
}
