package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of every SparkEntry query:
  *   runMain graft.tools.ExplainCli [sfDir] [outFile]
  * The audit artifact behind the scale claims — shows pushed filters,
  * read schemas, exchange count, and whole-stage codegen spans per
  * query (PlanSpec asserts the load-bearing ones; this is the full
  * picture for eyeballing).
  */
object ExplainCli {
  def main(args: Array[String]): Unit = {
    // query CONSTRUCTION already materializes side-channel dumps
    // (dumpSide is eager), so redirect them away from Verify's files
    sys.props("graft.side.dir") =
      java.nio.file.Files.createTempDirectory("graft-explain-side").toString
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outFile = if (args.length > 1) args(1) else "/tmp/graft_plans.txt"
    // optional 3rd arg: comma-separated query subset;
    // SPARK_GRAFT_BENCH_MODE=1 explains the bench variants instead
    val onlyQ: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qmap = if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("1"))
      graft.SparkEntry.benchQueries else graft.SparkEntry.queries
    val sb = new StringBuilder
    qmap.toSeq.sortBy(_._1)
      .filter { case (name, _) => onlyQ.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      sb.append(s"\n===== $name =====\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => sb.append(s"(explain failed: ${e.getMessage})\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), sb.toString)
    println(s"EXPLAIN-OK wrote ${sb.length} chars to $outFile")
    spark.stop()
  }
}
