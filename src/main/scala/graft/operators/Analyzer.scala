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

  /** JSON string escape: backslash, quote, and control chars — a
    * field name containing either would otherwise emit malformed JSON.
    */
  private[graft] def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Rendered report — the reference's text/json/yaml output modes
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
              case s: String => "\"" + jsonEscape(s) + "\""
              case other => String.valueOf(other)
            }
            "\"" + jsonEscape(c) + "\": " + vs
          }.mkString("{", ", ", "}")
        }.mkString("[", ",\n ", "]")
      case "yaml" =>
        // block-sequence-of-mappings form; string values emitted as
        // YAML double-quoted scalars, which share JSON's escape rules
        // — single-quoting only doubled quotes and left newlines /
        // control chars to corrupt the block structure
        rows.map { r =>
          cols.zipWithIndex.map { case (c, i) =>
            val v = r.getAs[Any](c)
            val vs = v match {
              case s: String => "\"" + jsonEscape(s) + "\""
              case other => String.valueOf(other)
            }
            (if (i == 0) "- " else "  ") + c + ": " + vs
          }.mkString("\n")
        }.mkString("\n")
      case _ =>
        val header = f"${"field"}%-12s ${"total"}%10s ${"n_uniq"}%10s " +
          f"${"minlen"}%7s ${"maxlen"}%7s ${"avglen"}%9s ${"share"}%8s  flags"
        val lines = rows.map { r =>
          // empty/all-null fields leave min/max/avg/share NULL — print
          // "-" rather than NPE on primitive unboxing
          def l(c: String): String =
            Option(r.getAs[Any](c)).fold("-")(v => f"${v.asInstanceOf[Long]}%d")
          def d(c: String): String =
            Option(r.getAs[Any](c)).fold("-")(v => f"${v.asInstanceOf[Double]}%.2f")
          def b(c: String): Boolean =
            Option(r.getAs[Any](c)).exists(_.asInstanceOf[Boolean])
          val flags = Seq(
            if (b("is_uniq")) Some("uniq") else None,
            if (b("is_dictkey")) Some("dictkey") else None)
            .flatten.mkString(",")
          f"${r.getAs[String]("field")}%-12s ${l("total")}%10s " +
            f"${l("n_uniq")}%10s ${l("minlen")}%7s " +
            f"${l("maxlen")}%7s ${d("avglen")}%9s " +
            f"${d("share_uniq")}%8s  $flags"
        }
        (header +: lines.toSeq).mkString("\n")
    }
  }

  /** A file-level analysis: what was detected and the table behind it.
    * `df` stays a lazy distributed plan; only detection metadata is
    * driver-side.
    */
  final case class FileAnalysis(path: String, container: String,
                                format: String, encoding: String,
                                delimiter: String, df: DataFrame) {
    def render(mode: String = "text"): String = {
      val head = Seq(
        "path" -> path, "container" -> container, "format" -> format,
        "encoding" -> encoding, "delimiter" -> delimiter)
      mode match {
        case "json" =>
          "{" + head.map { case (k, v) =>
            "\"" + jsonEscape(k) + "\": \"" + jsonEscape(v) + "\""
          }.mkString(", ") + ", \"fields\": " + renderReport(df, "json") + "}"
        case "yaml" =>
          head.map { case (k, v) => s"""$k: "${jsonEscape(v)}"""" }
            .mkString("\n") + "\nfields:\n" + renderReport(df, "yaml")
        case _ =>
          head.map { case (k, v) => f"$k%-10s $v" }.mkString("\n") +
            "\n\n" + renderReport(df, "text")
      }
    }
  }

  /** The reference's file-level `analyze` entry point
    * (undatum/cmds/analyzer.py:221-413 composes container detection,
    * encoding/delimiter sniffing, format dispatch, and the table
    * profile over one path): container unpack (zip/zst/lz4) ->
    * extension format dispatch -> bounded-prefix encoding+delimiter
    * sniff for text formats -> distributed read -> profile. Detection
    * reads a bounded prefix on the driver (exactly the reference's
    * 1MB chardet pre-pass); everything per-row stays a Spark plan.
    */
  def analyzeFile(spark: org.apache.spark.sql.SparkSession, path: String,
                  format: String = ""): FileAnalysis = {
    import graft.sources.{Converter, Sniff}
    val lower = path.toLowerCase
    val containers = graft.sources.Converter.ContainerSuffixes
    val container = containers.find(lower.endsWith).map(_.drop(1)).getOrElse("none")
    val dataPath = if (container == "none") path else Converter.unpackToTemp(path)
    val fmt =
      if (format.nonEmpty) format
      // ONE shared extension table (Converter.formatOfExtension) —
      // the CLI's output inference reads the same dispatch
      else Converter.formatOfExtension(dataPath, "csv")
    val (enc, delim) =
      if (fmt == "csv") Sniff.sniffFile(dataPath)
      else ("UTF-8", "")
    val df = Converter.read(spark, dataPath,
      Converter.ReadOptions(fmt, delimiter = if (delim.isEmpty) "," else delim,
        encoding = enc))
    FileAnalysis(path, container, fmt, enc, delim, df)
  }
}
