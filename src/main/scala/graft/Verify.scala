package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query subset (local iteration)
    val onlyQ: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Harden the oracle side-channel: the static path baked into the
    // oracle SQL is predictable, so wipe anything pre-existing (stale
    // dumps from a prior run, or a pre-created dir) and recreate it
    // owner-only before any query dumps into it. Skipped when running
    // a query subset — a full prior dump set may still be compared.
    if (onlyQ.isEmpty) {
      val side = java.nio.file.Paths.get(
        sys.props.getOrElse("graft.side.dir", "/tmp/graft_oracle_side"))
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val s = Files.list(p) // close, or each subdir leaks an FD
          try s.forEach(rm(_)) finally s.close()
        }
        Files.deleteIfExists(p)
      }
      rm(side)
      Files.createDirectories(side,
        java.nio.file.attribute.PosixFilePermissions.asFileAttribute(
          java.nio.file.attribute.PosixFilePermissions.fromString("rwx------")))
    }
    SparkEntry.queries
      .filter { case (name, _) => onlyQ.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a STALE dump from a previous run into the same outDir would
        // otherwise be compared as if it were this run's result —
        // reporting a regression as a pass
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape — shared with the report renderer so the two
    // cannot drift (a control char the driver's json.load rejects
    // would silently zero the round's correctness)
    def q(s: String): String =
      "\"" + graft.operators.Analyzer.jsonEscape(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
