package graft.tools

import org.apache.spark.sql.SparkSession

/** Session factory for the runnable mains: honors a master provided
  * by spark-submit (`--master` sets spark.master) and falls back to
  * local[N] when launched directly (e.g. `sbt runMain`).
  */
object Sessions {
  def create(appName: String, defaultCpus: String = "8",
             shufflePartitions: Int = 32): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val withMaster =
      if (sys.props.contains("spark.master")) b else b.master(s"local[$cpus]")
    val s = withMaster.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
