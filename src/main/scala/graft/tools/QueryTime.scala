package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: runMain graft.tools.QueryTime <sfDir> <q>...
  * Times each named SparkEntry query twice (cold, warm) at local[32] —
  * the iterate-fast complement to the full Bench.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    sys.props("graft.side.dir") = // don't clobber Verify's oracle side files
      java.nio.file.Files.createTempDirectory("graft-qtime-side").toString
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.create("graft-qtime", defaultCpus = "32",
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // SPARK_GRAFT_BENCH_MODE=1 times the no-dump bench variants
    val qmap = if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("1"))
      graft.SparkEntry.benchQueries else graft.SparkEntry.queries
    names.foreach { n =>
      val fn = qmap(n)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // toRdd, not count(): count() injects an aggregate that lets
        // Catalyst prune the very expressions being timed (same
        // methodology as the official Bench)
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n%-24s cold=${times(0)}%7.2fs warm=${times(1)}%7.2fs")
    }
    spark.stop()
  }
}
