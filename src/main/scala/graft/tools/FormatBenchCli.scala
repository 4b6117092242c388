package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-node throughput of the from-scratch format codecs — the
  * conversion-surface analog of the encode bench. The reference's
  * converter is a single-threaded Python loop (csv/DictReader,
  * bson.BSON.encode-per-record, openpyxl cell iteration); these
  * numbers document the JVM single-stream equivalents on the same
  * shape of data. Prints one line per (format, direction): rows/s and
  * MB/s over a 100k-row two-string-one-double-one-bool table.
  */
object FormatBenchCli {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toInt else 100000
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val df = (0 until rows).map { i =>
      (i.toLong, s"doc_$i " + rng.alphanumeric.take(40).mkString,
        rng.nextDouble() * 1000, i % 3 == 0)
    }.toDF("id", "name", "score", "flag").coalesce(1).cache()
    df.count()

    val dir = java.nio.file.Files.createTempDirectory("fmt-bench").toString
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def sizeOf(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length()
      else f.listFiles().map(c => sizeOf(c.getPath)).sum
    }
    for (fmt <- Seq("csv", "jsonl", "bson", "xlsx", "xls")) {
      // BIFF8 hard-caps a sheet at 65536 rows (the writer refuses, by
      // contract) — bench that format at its ceiling
      val fmtRows = if (fmt == "xls") math.min(rows, 65000) else rows
      val fdf = if (fmtRows == rows) df else df.limit(fmtRows).cache()
      val p = s"$dir/t-$fmt"
      val (_, wSec) = time(graft.sources.Converter.write(fdf, p, fmt))
      val mb = sizeOf(p) / 1e6
      val (n, rSec) = time(graft.sources.Converter.read(spark, p,
        graft.sources.Converter.ReadOptions(fmt)).count())
      require(n == fmtRows, s"$fmt: read $n of $fmtRows rows")
      println(f"FMT $fmt%-5s write ${fmtRows / wSec}%,.0f rows/s ${mb / wSec}%6.1f MB/s   " +
        f"read ${fmtRows / rSec}%,.0f rows/s ${mb / rSec}%6.1f MB/s   (${mb}%5.1f MB)")
    }
    spark.stop()
  }
}
