package graft.tools

import org.apache.spark.sql.functions._
import graft.encode.TokenEncoder
import graft.encode.TokenEncoder.EncodeConfig
import graft.synth.TokenSynth

/** Compression-ratio gate at arbitrary scale: our encoded bytes vs the
  * reference baseline (zstd-compressed Parquet of the same raw tokens
  * column — BASELINE.json north_star).
  *   sbt "runMain graft.tools.RatioGateCli [rows]"
  */
object RatioGateCli {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 600000L
    val spark = Sessions.create("graft-ratio-gate", defaultCpus = "16")
    val base = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp")
    val out = s"$base/graft-gate"
    val refDir = s"$base/graft-gate-ref"
    Seq(out, refDir).foreach(p => new ProcessBuilder("rm", "-rf", p).start().waitFor())
    val ds = TokenSynth.dataset(spark, rows, parallelism = 64)
    val lineage = TokenEncoder.run(ds, out,
      EncodeConfig(targetRowsPerPart = math.max(1000L, rows / 128).toInt, cacheInput = false))
    val ours = lineage.agg(sum("encodedBytes"), sum("rawBytes")).collect()(0)
    ds.select("tokens").write.mode("overwrite")
      .option("compression", "zstd").parquet(refDir)
    def dirSize(f: java.io.File): Long =
      if (f.isFile) f.length
      else if (f.isDirectory) f.listFiles.map(dirSize).sum
      else 0L
    val ref = dirSize(new java.io.File(refDir))
    println(s"rows=$rows raw_bytes=${ours.getLong(1)} ours_bytes=${ours.getLong(0)} " +
      s"zstd_parquet_bytes=$ref")
    println(f"ours_vs_baseline=${ref.toDouble / ours.getLong(0)}%.3fx better " +
      f"(gate ${if (ours.getLong(0) <= ref) "PASS" else "FAIL"})")
    Seq(out, refDir).foreach(p => new ProcessBuilder("rm", "-rf", p).start().waitFor())
    spark.stop()
    if (ours.getLong(0) > ref) sys.exit(1)
  }
}
