package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain(formatted)` for selected SparkEntry
  * queries so pushdown/pruning/codegen can be inspected (the
  * would-this-survive-100TB check).
  *   sbt "runMain graft.tools.ExplainCli [queryName ...]"
  */
object ExplainCli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_filter_dsl", "q_agg_pricing", "q_select", "q_token_count",
      "q_minhash_pairs", "q_events_topk")
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
