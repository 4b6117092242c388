package graft.tools

import org.apache.spark.sql.functions._
import graft.codec.CodecIds
import graft.encode.TokenEncoder
import graft.encode.TokenEncoder.EncodeConfig
import graft.synth.TokenSynth

/** Codec-selection census: encodes the synthetic corpus and reports,
  * per winning codec, block counts, token mass, raw vs encoded bytes
  * and the achieved ratio — the diagnostic for "is a new codec worth
  * adding" and "is auto-selection picking what we think it picks".
  *   sbt "runMain graft.tools.CodecDistCli [rows]"
  */
object CodecDistCli {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 600000L
    val spark = Sessions.create("graft-codec-dist", defaultCpus = "16")
    val base = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp")
    val out = s"$base/graft-dist"
    new ProcessBuilder("rm", "-rf", out).start().waitFor()
    val ds = TokenSynth.dataset(spark, rows, parallelism = 64)
    val lineage = TokenEncoder.run(ds, out,
      EncodeConfig(targetRowsPerPart = math.max(1000L, rows / 128).toInt,
        cacheInput = false))
    val nameFor = udf((id: Int) => CodecIds.names.getOrElse(id, s"?$id"))
    println("codec census (one row per winning codec):")
    lineage.groupBy(col("codecId"), col("postCodec"))
      .agg(count(lit(1)).as("blocks"),
        sum("totalTokens").as("tokens"),
        sum("rawBytes").as("raw"),
        sum("encodedBytes").as("enc"))
      .withColumn("codec", nameFor(col("codecId")))
      .withColumn("ratio", round(col("raw") / col("enc"), 3))
      .select("codec", "postCodec", "blocks", "tokens", "raw", "enc", "ratio")
      .orderBy(col("raw").desc)
      .show(50, truncate = false)
    val tot = lineage.agg(sum("rawBytes"), sum("encodedBytes")).collect()(0)
    println(f"TOTAL ratio=${tot.getLong(0).toDouble / tot.getLong(1)}%.3f")
    new ProcessBuilder("rm", "-rf", out).start().waitFor()
    spark.stop()
  }
}
