package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.encode.TokenEncoder
import graft.encode.TokenEncoder.EncodeConfig

/** Supplementary benchmarks the FROZEN official harness cannot carry
  * (Bench.scala is hash-pinned):
  *
  *  1. A BELOW-BUS-CEILING encode scaling pair (VERDICT r6 #8): the
  *     official 8→32 pair saturates this host's single memory bus
  *     (tools.KernelScaling shows the kernels flat above ~8 threads),
  *     so 4→16 is the honest window where thread scaling can still
  *     show — alternating reps, best-of per level, same protocol as
  *     the official pair.
  *  2. Noop-sink isolation (guide §1.4) for named bench queries: time
  *     the computation via `noop` writes, cold and warm, so staging
  *     and sink costs are visibly excluded.
  *
  * Usage: runMain graft.tools.BenchExtra [pair|noop <sfDir> <q>,...]
  * Prints one JSON line per section (not the driver's contract line —
  * this main is supplementary evidence cited from OPTIMIZATION_r07.md).
  */
object BenchExtra {

  private def localDir(): String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-benchx")
      d.mkdirs()
      d.getAbsolutePath
    } else "/tmp"
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchx-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", localDir())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def withSession[A](cpus: Int)(f: SparkSession => A): A = {
    val s = session(cpus)
    try f(s)
    finally {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def ensureInput(spark: SparkSession, rows: Long): String = {
    val path = s"${localDir()}/graft-input-$rows"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      graft.synth.TokenSynth.dataset(spark, rows, parallelism = 128)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  private def encodeJob(spark: SparkSession, rows: Long, cpus: Int): Double = {
    val outDir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(localDir()), s"graft-benchx-$cpus").toString
    val input = ensureInput(spark, rows)
    val ds = {
      import spark.implicits._
      spark.read.parquet(input).as[graft.model.TokenRow]
    }
    val target = math.max(1000L, rows / 128).toInt
    val t0 = System.nanoTime()
    val lineage = TokenEncoder.run(ds, outDir,
      EncodeConfig(targetRowsPerPart = target, cacheInput = false))
    val tok = lineage.agg(sum("totalTokens")).collect()(0).getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    new ProcessBuilder("rm", "-rf", outDir).start().waitFor()
    tok / secs
  }

  private def scalingPair(): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "600000").toLong
    val (lo, hi) = (4, 16)
    def oneRun(cpus: Int): Double = withSession(cpus) { s =>
      encodeJob(s, rows / 10, cpus) // warm JIT/codegen per session
      encodeJob(s, rows, cpus)
    }
    // alternating reps, best-of per level — the official pair's
    // noise-filtering protocol at the below-ceiling core counts
    val pairs = (1 to 2).map(_ => (oneRun(lo), oneRun(hi)))
    val thrLo = pairs.map(_._1).max
    val thrHi = pairs.map(_._2).max
    val eff = thrHi / (thrLo * (hi.toDouble / lo))
    println(f"""{"benchextra":"pair_4_16","tokens_per_sec_4":${thrLo.toLong},"tokens_per_sec_16":${thrHi.toLong},"scaling_efficiency_4_16":$eff%.3f,"pairs":${pairs.size}}""")
  }

  private def noopQueries(sfDir: String, names: Seq[String]): Unit = {
    sys.props("graft.side.dir") =
      java.nio.file.Files.createTempDirectory("graft-benchx-side").toString
    withSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt) { s =>
      names.foreach { n =>
        val fn = graft.SparkEntry.benchQueries(n)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          // guide §1.4: noop computes every column of every row and
          // discards it — times the computation, not the sink
          fn(s, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"benchextra":"noop","query":"$n","cold_s":${times(0)}%.3f,"warm_s":${times(1)}%.3f}""")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    args.headOption.getOrElse("pair") match {
      case "pair" => scalingPair()
      case "noop" => noopQueries(args(1), args(2).split(",").toSeq)
      case other => sys.error(s"unknown mode $other")
    }
  }
}
