package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's `analyze`/`schema` report surface
  * (undatum/cmds/analyzer.py:221-413, schemer.py:94-243): table-level
  * profile + schema identity fingerprint.
  */
object Analyzer {

  /** Schema identity = xxhash64 of '|'-joined sorted field names —
    * exactly undatum/cmds/schemer.py:40-41 (it uses xxhash64 of the
    * sorted header list to group files by schema).
    */
  def schemaFingerprint(df: DataFrame): DataFrame = {
    val joined = UndatumOps.headerPaths(df.schema).sorted.mkString("|")
    df.sparkSession.range(1).select(
      lit(joined).as("fields"),
      xxhash64(lit(joined)).as("schema_key"))
  }

  /** Table report: row count, column count, flatness (CSV-convertible
    * iff no complex columns — undatum/utils.py:181-188), per-field
    * profile. One job.
    */
  def report(df: DataFrame, fields: Seq[String] = Nil): DataFrame = {
    val fs = if (fields.nonEmpty) fields else df.schema.fieldNames.toSeq
    val isFlat = !df.schema.fields.exists(f => f.dataType match {
      case _: StructType | _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType => true
      case _ => false
    })
    UndatumOps.fieldStats(df, fs)
      .withColumn("table_is_flat", lit(isFlat))
  }
}
