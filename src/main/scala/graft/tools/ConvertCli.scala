package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.{Converter, Sniff}
import graft.sources.Converter.ReadOptions

/** `undatum convert IN OUT`-shaped CLI (reference flagship,
  * undatum/cmds/converter.py): formats inferred from extensions,
  * CSV encoding/delimiter sniffed from a bounded prefix.
  *   sbt "runMain graft.tools.ConvertCli <in> <inFormat> <out> <outFormat>"
  */
object ConvertCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: ConvertCli <in> <inFormat> <out> <outFormat>")
      sys.exit(2)
    }
    val Array(in, inFmt, out, outFmt) = args.take(4)
    val spark = Sessions.create("graft-convert")
    try {
      val opts =
        if (inFmt == "csv" && new java.io.File(in).isFile) {
          val (enc, delim) = Sniff.sniffFile(in)
          println(s"sniffed encoding=$enc delimiter=${if (delim == "\t") "\\t" else delim}")
          ReadOptions("csv", delimiter = delim, encoding = enc)
        } else ReadOptions(inFmt)
      val df = Converter.read(spark, in, opts)
      Converter.write(df, out, outFmt)
      val n = Converter.read(spark, out, ReadOptions(outFmt)).count()
      println(s"converted rows=$n -> $out ($outFmt)")
      println("CONVERT-OK")
    } catch {
      case e: IllegalArgumentException =>
        System.err.println(s"error: ${e.getMessage}")
        spark.stop(); sys.exit(2)
    }
    spark.stop()
  }
}
