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

  /** Portable schema identity: md5 of the same joined-sorted-names
    * string — any engine can recompute it, so the DuckDB oracle
    * verifies the value (xxhash64 above is Spark-only).
    */
  def schemaFingerprintPortable(df: DataFrame): DataFrame = {
    val joined = UndatumOps.headerPaths(df.schema).sorted.mkString("|")
    df.sparkSession.range(1).select(
      lit(joined).as("fields"),
      md5(lit(joined)).as("schema_md5"))
  }

  /** Cerberus-style typed schema doc — the reference's `scheme`
    * command (undatum/common/scheme.py:63-197, cmds/schemer.py:247-274
    * walks sampled records and emits {field: {type, nullable,
    * schema}}). Spark already holds the full nested schema, so this is
    * a pure metadata walk: one row per path (structs recurse, arrays
    * keep their element type as `list of <t>`), with the cerberus type
    * vocabulary.
    */
  def scheme(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    def typeName(dt: DataType): String = dt match {
      case _: StringType => "string"
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "integer"
      case _: FloatType | _: DoubleType | _: DecimalType => "float"
      case _: BooleanType => "boolean"
      case _: TimestampType | _: TimestampNTZType => "datetime"
      case _: DateType => "date"
      case _: BinaryType => "binary"
      case a: ArrayType => s"list of ${typeName(a.elementType)}"
      case _: StructType => "dict"
      case _: MapType => "dict"
      case other => other.typeName
    }
    def walk(st: StructType, prefix: String): Seq[(String, String, Boolean)] =
      st.fields.toSeq.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case nested: StructType =>
            (path, "dict", f.nullable) +: walk(nested, path)
          case dt => Seq((path, typeName(dt), f.nullable))
        }
      }
    val spark = df.sparkSession
    import spark.implicits._
    walk(df.schema, "").toDF("field", "stype", "nullable")
  }

  /** Merge two scheme docs (the reference merges per-file schemes into
    * one — scheme.py's duplicate-elimination pass): union of paths;
    * agreeing types keep the type, conflicts widen to `string`;
    * nullable if nullable in either or missing from one side.
    */
  def schemeMerge(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("field"), col("stype").as("t_a"), col("nullable").as("n_a"))
    val r = b.select(col("field"), col("stype").as("t_b"), col("nullable").as("n_b"))
    l.join(r, Seq("field"), "full_outer")
      .select(col("field"),
        when(col("t_a").isNull, col("t_b"))
          .when(col("t_b").isNull, col("t_a"))
          .when(col("t_a") === col("t_b"), col("t_a"))
          .otherwise(lit("string")).as("stype"),
        (col("n_a").isNull || col("n_b").isNull ||
          col("n_a") || col("n_b")).as("nullable"))
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

  /** Rendered report — the reference's text/json output modes
    * (undatum/cmds/analyzer.py:424-471 renders the analyze dict as
    * text or json/yaml). The profile stays a distributed job; only the
    * bounded per-field summary rows are collected for rendering.
    */
  def renderReport(df: DataFrame, format: String = "text",
                   fields: Seq[String] = Nil): String = {
    val rows = report(df, fields).collect()
    val cols = Seq("field", "total", "n_uniq", "minlen", "maxlen",
      "avglen", "share_uniq", "is_uniq", "is_dictkey")
    format match {
      case "json" =>
        rows.map { r =>
          cols.map { c =>
            val v = r.getAs[Any](c)
            val vs = v match {
              case s: String => "\"" + s + "\""
              case other => String.valueOf(other)
            }
            "\"" + c + "\": " + vs
          }.mkString("{", ", ", "}")
        }.mkString("[", ",\n ", "]")
      case _ =>
        val header = f"${"field"}%-12s ${"total"}%10s ${"n_uniq"}%10s " +
          f"${"minlen"}%7s ${"maxlen"}%7s ${"avglen"}%9s ${"share"}%8s  flags"
        val lines = rows.map { r =>
          val flags = Seq(
            if (r.getAs[Boolean]("is_uniq")) Some("uniq") else None,
            if (r.getAs[Boolean]("is_dictkey")) Some("dictkey") else None)
            .flatten.mkString(",")
          f"${r.getAs[String]("field")}%-12s ${r.getAs[Long]("total")}%10d " +
            f"${r.getAs[Long]("n_uniq")}%10d ${r.getAs[Long]("minlen")}%7d " +
            f"${r.getAs[Long]("maxlen")}%7d ${r.getAs[Double]("avglen")}%9.2f " +
            f"${r.getAs[Double]("share_uniq")}%8.2f  $flags"
        }
        (header +: lines.toSeq).mkString("\n")
    }
  }
}
