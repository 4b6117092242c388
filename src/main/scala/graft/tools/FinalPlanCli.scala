package graft.tools

/** Execute named SparkEntry queries and dump their FINAL adaptive
  * plans (post-execution, reused stages visible):
  *   runMain graft.tools.FinalPlanCli <sfDir> <outFile> <q>[,<q>...]
  * SPARK_GRAFT_BENCH_MODE=1 uses the bench variants. The complement
  * of ExplainCli, which prints the pre-execution plan (AQE hides
  * runtime stage reuse and coalescing there).
  */
object FinalPlanCli {
  def main(args: Array[String]): Unit = {
    sys.props("graft.side.dir") =
      java.nio.file.Files.createTempDirectory("graft-fplan-side").toString
    val sfDir = args(0)
    val outFile = args(1)
    val names = args(2).split(",").toSeq
    val spark = Sessions.create("graft-fplan", defaultCpus = "32",
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val qmap = if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("1"))
      graft.SparkEntry.benchQueries else graft.SparkEntry.queries
    val sb = new StringBuilder
    names.foreach { n =>
      sb.append(s"\n===== $n =====\n")
      try {
        val df = qmap(n)(spark, sfDir)
        df.queryExecution.toRdd.count()
        sb.append(df.queryExecution.executedPlan.toString)
      } catch {
        case e: Throwable => sb.append(s"(failed: ${e.getMessage})\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"FINALPLAN-OK wrote ${sb.length} chars to $outFile")
    spark.stop()
  }
}
