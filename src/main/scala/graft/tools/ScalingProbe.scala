package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.encode.TokenEncoder
import graft.encode.TokenEncoder.EncodeConfig
import graft.synth.TokenSynth

/** Repeated-measure scaling probe: alternates encode jobs at two
  * parallelism levels to separate real scaling from run-to-run noise.
  *   sbt "runMain graft.tools.ScalingProbe [rows] [reps]"
  */
object ScalingProbe {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def job(spark: SparkSession, rows: Long, write: Boolean = true): Double = {
    val outDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp")),
      "probe").toString
    val ds = TokenSynth.dataset(spark, rows, parallelism = 128)
    val cfg = EncodeConfig(targetRowsPerPart = math.max(1000L, rows / 128).toInt)
    val t0 = System.nanoTime()
    val tok =
      if (write) {
        val lineage = TokenEncoder.run(ds, outDir, cfg)
        lineage.agg(sum("totalTokens")).collect()(0).getLong(0)
      } else {
        val plan = TokenEncoder.partitionPlan(ds, cfg.targetRowsPerPart)
        TokenEncoder.encodeBlocks(ds, plan, cfg)
          .agg(sum("totalTokens")).collect()(0).getLong(0)
      }
    val secs = (System.nanoTime() - t0) / 1e9
    new ProcessBuilder("rm", "-rf", outDir).start().waitFor()
    tok / secs
  }

  /** Separate phases: synth-only, encode-no-write, full. */
  def phases(spark: SparkSession, rows: Long): Unit = {
    val ds = TokenSynth.dataset(spark, rows, parallelism = 128)
    val t0 = System.nanoTime()
    ds.agg(sum("n_tok")).collect()
    println(f"  synth_only_secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    println(f"  nowrite_tokens_per_sec=${job(spark, rows, write = false).toLong}")
    println(f"  full_tokens_per_sec=${job(spark, rows, write = true).toLong}")
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 600000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val levels = sys.env.getOrElse("SPARK_GRAFT_PROBE_LEVELS", "2,8")
      .split(",").map(_.trim.toInt).toSeq
    levels.foreach { cpus =>
      val s = session(cpus)
      job(s, rows / 10) // warmup
      (1 to reps).foreach { i =>
        println(s"cpus=$cpus rep=$i")
        phases(s, rows)
      }
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
