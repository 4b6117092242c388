package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.encode.TokenEncoder
import graft.encode.TokenEncoder.EncodeConfig
import graft.synth.TokenSynth

/** Probe for the no-shuffle encode lever: on the SAME pre-staged
  * parquet input, time (a) the shuffled path over the plain layout,
  * (b) the shuffled path over a source-clustered layout, (c) the
  * no-shuffle path over the clustered layout. Alternating reps,
  * best-of per variant (the sandbox noise protocol).
  *   sbt "runMain graft.tools.NoShufProbe [rows] [reps] [cpus]"
  */
object NoShufProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 150000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = if (args.length > 2) args(2).toInt else 32
    val base = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-noshuf" else "/tmp/graft-noshuf"
    }
    new java.io.File(base).mkdirs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", base)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // stage both layouts once (untimed, as a previous pipeline stage):
    // "clustered" = files laid out by the encode plan's OWN partIds
    // (each input partition holds one or a few partIds at full
    // parallelism) — the scenario the no-shuffle path targets
    val target = math.max(1000L, rows / 128).toInt
    val plainPath = s"$base/plain-$rows"
    val clusPath = s"$base/clustered-$rows"
    // idempotence keys on the LAST staging artifact (the plan tsv) so
    // a crash mid-staging re-stages instead of wedging later runs
    val plan: Map[String, (Int, Int)] =
      if (!new java.io.File(s"$base/plan-$rows.tsv").exists()) {
        val ds = TokenSynth.dataset(spark, rows, parallelism = 128)
        ds.write.mode("overwrite").parquet(plainPath)
        val plain = spark.read.parquet(plainPath).as[graft.model.TokenRow]
        val p = TokenEncoder.partitionPlan(plain, target)
        val nParts = TokenEncoder.planSaltTotal(p) + TokenEncoder.OverflowSlots
        val pB = p
        plain.map(r => (TokenEncoder.partIdOf(pB, r), r))
          .toDF("partId", "r")
          .repartition(nParts, col("partId"))
          .select("r.*").as[graft.model.TokenRow]
          .write.mode("overwrite").parquet(clusPath)
        // the encoder's own (escaped, versioned) plan serializer —
        // a hand-rolled TSV here would reintroduce the tab/newline
        // corruption savePlan was hardened against
        TokenEncoder.savePlan(p, s"$base/plan-$rows")
        p
      } else TokenEncoder.loadPlan(s"$base/plan-$rows").get

    // staged files are small at probe scale; default 128MB packing
    // would coalesce them into a few input partitions and strangle
    // the no-shuffle path (see Bench.noShufRun)
    spark.conf.set("spark.sql.files.maxPartitionBytes", 4L << 20)
    spark.conf.set("spark.sql.files.openCostInBytes", 0L)

    def run(path: String, noShuf: Boolean): Double = {
      val out = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "enc").toString
      // the clustered layout was written under THIS plan — pin it so
      // the encode's partIds match the file layout exactly
      TokenEncoder.savePlan(plan, out)
      val ds = spark.read.parquet(path).as[graft.model.TokenRow]
      val t0 = System.nanoTime()
      val lineage = TokenEncoder.run(ds, out,
        EncodeConfig(targetRowsPerPart = target, cacheInput = false,
          noShuffle = noShuf))
      val tok = lineage.agg(sum("totalTokens")).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      new ProcessBuilder("rm", "-rf", out).start().waitFor()
      tok / secs
    }

    // warm
    run(plainPath, noShuf = false)
    val variants = Seq(
      "shuffled_plain" -> (() => run(plainPath, noShuf = false)),
      "shuffled_clustered" -> (() => run(clusPath, noShuf = false)),
      "noshuffle_clustered" -> (() => run(clusPath, noShuf = true)))
    val samples = (1 to reps).flatMap { rep =>
      variants.map { case (name, f) =>
        val v = f()
        println(f"  rep=$rep $name%-20s ${v.toLong} tok/s")
        name -> v
      }
    }
    variants.foreach { case (name, _) =>
      val best = samples.collect { case (n, v) if n == name => v }.max
      println(f"BEST $name%-20s ${best.toLong} tok/s")
    }
    spark.stop()
  }
}
