package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all Spark-touching specs (one JVM,
  * one session — sbt forks a single test JVM).
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
  def dirSize(path: String): Long = {
    val f = new java.io.File(path)
    if (f.isFile) f.length()
    else if (f.isDirectory) f.listFiles().map(c => dirSize(c.getPath)).sum
    else 0L
  }
}

object SparkSpecBase {
  // tests exercising SparkEntry queries must not clobber the oracle
  // side-channel a pending Verify->DuckDB compare may still read
  sys.props("graft.side.dir") =
    java.nio.file.Files.createTempDirectory("graft-test-side").toString

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
