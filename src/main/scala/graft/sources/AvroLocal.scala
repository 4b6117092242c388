package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro source/sink over the CORE avro jar (avro-1.12.1 ships in
  * /opt/spark/jars; the spark-avro CONNECTOR module does not, so the
  * distributed `.format("avro")` path cannot load in this sandbox).
  *
  * This is a driver-side single-stream writer/reader — exactly the
  * reference's own avro semantics (undatum writes avro through
  * fastavro on one thread, converter.py:414-440), so for the formats
  * undatum users actually move through avro (bounded exports) the
  * behavior matches. At scale, avro remains an EXPORT format here;
  * the scale path is parquet/orc (distributed).
  *
  * Schema scope: primitives (string/int/long/float/double/boolean/
  * binary), date/timestamp (serialized as ISO strings, documented),
  * arrays, and nested structs; nullable fields become
  * union(null, T). Maps/decimals degrade to JSON strings via
  * `Converter.makeFlat` upstream if present.
  */
object AvroLocal {

  def sparkToAvroSchema(st: StructType, name: String = "row"): Schema = {
    // name mangling must stay injective — "a b" and "a-b" both map to
    // "a_b", and avro would otherwise throw an error naming NEITHER
    // original column
    val collisions = st.fields.groupBy(f => avroName(f.name)).filter(_._2.length > 1)
    require(collisions.isEmpty,
      "avro sink: columns collide after avro-name mangling: " +
        collisions.map { case (m, fs) =>
          s"${fs.map(_.name).mkString(" / ")} -> $m" }.mkString("; ") +
        " — rename the columns before writing")
    val fields = st.fields.map { f =>
      new Schema.Field(avroName(f.name), fieldSchema(f.dataType, f.nullable,
        avroName(f.name)), null, null)
    }
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  // avro names are [A-Za-z_][A-Za-z0-9_]* — mangle anything else
  private def avroName(n: String): String = {
    val s = n.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    if (s.isEmpty || s.head.isDigit) "_" + s else s
  }

  private def fieldSchema(dt: DataType, nullable: Boolean, name: String): Schema = {
    val base = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case DateType | TimestampType | TimestampNTZType =>
        Schema.create(Schema.Type.STRING) // ISO string — documented
      case _: DecimalType => Schema.create(Schema.Type.STRING)
      case ArrayType(elem, elemNullable) =>
        Schema.createArray(fieldSchema(elem, elemNullable, name + "_item"))
      case st: StructType => sparkToAvroSchema(st, name + "_rec")
      case other =>
        throw new IllegalArgumentException(s"avro sink: unsupported type $other " +
          "(flatten maps/complex columns with Converter.makeFlat first)")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  private def unwrapUnion(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def toAvro(v: Any, dt: DataType, s: Schema): Any = v match {
    case null => null
    case _ => (dt, v) match {
      case (ByteType, b: Byte) => b.toInt
      case (ShortType, x: Short) => x.toInt
      case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
      case (DateType | TimestampType | TimestampNTZType | _: DecimalType, x) =>
        x.toString
      case (ArrayType(elem, _), xs: scala.collection.Seq[_]) =>
        val es = unwrapUnion(s).getElementType
        xs.map(toAvro(_, elem, es)).asJava
      case (st: StructType, r: Row) => rowToRecord(r, st, unwrapUnion(s))
      case (_, x) => x
    }
  }

  private def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val fs = schema.getField(avroName(f.name)).schema()
      rec.put(avroName(f.name),
        toAvro(if (row.isNullAt(i)) null else row.get(i), f.dataType, unwrapUnion(fs)))
    }
    rec
  }

  /** Write `df` as ONE avro container file at `path` (a file, not a
    * Spark directory) through `toLocalIterator` — bounded driver
    * memory (one partition at a time), single stream like the
    * reference's writer. Returns rows written.
    */
  def write(df: DataFrame, path: String, codec: String = "deflate"): Long = {
    val schema = sparkToAvroSchema(df.schema)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(codec match {
      case "" | "deflate" => CodecFactory.deflateCodec(6)
      case "null" | "uncompressed" => CodecFactory.nullCodec()
      case "snappy" => CodecFactory.snappyCodec()
      case "zstandard" | "zstd" => CodecFactory.zstandardCodec(3)
      case c => CodecFactory.fromString(c)
    })
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    w.create(schema, f)
    var n = 0L
    try {
      val it = df.toLocalIterator()
      while (it.hasNext) { w.append(rowToRecord(it.next(), df.schema, schema)); n += 1 }
    } finally w.close()
    n
  }

  private def avroToSpark(s: Schema): DataType = unwrapUnion(s).getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY => ArrayType(avroToSpark(unwrapUnion(s).getElementType))
    case Schema.Type.RECORD => recordToStruct(unwrapUnion(s))
    case Schema.Type.ENUM => StringType
    case t => throw new IllegalArgumentException(s"avro read: unsupported type $t")
  }

  private def recordToStruct(s: Schema): StructType =
    StructType(s.getFields.asScala.map(f =>
      StructField(f.name(), avroToSpark(f.schema()),
        f.schema().getType == Schema.Type.UNION)).toArray)

  private def fromAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case xs: java.util.Collection[_] =>
      val ArrayType(elem, _) = dt: @unchecked
      xs.asScala.map(fromAvro(_, elem)).toSeq
    case r: GenericRecord =>
      val st = dt.asInstanceOf[StructType]
      recordToRow(r, st)
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case x => x
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.map(f => fromAvro(rec.get(f.name), f.dataType)).toSeq)

  /** Read an avro container file (or the .avro files of a directory)
    * into a DataFrame. Driver-side decode, then parallelize — the
    * symmetric import path for bounded avro exports.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(p => p.isFile && p.getName.endsWith(".avro")).sortBy(_.getName)
      else Array(f)
    require(files.nonEmpty, s"no .avro files at $path")
    var schema: StructType = null
    val rows = files.toSeq.flatMap { file =>
      val r = new DataFileReader[GenericRecord](file,
        new GenericDatumReader[GenericRecord]())
      try {
        if (schema == null) schema = recordToStruct(r.getSchema)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (r.hasNext) buf += recordToRow(r.next(), schema)
        buf.toSeq
      } finally r.close()
    }
    spark.createDataFrame(rows.asJava, schema)
  }
}
