package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's `apply` command — a user function mapped over every
  * record, with the output schema discovered from the mapped results
  * (undatum/cmds/transformer.py:29-76; example script
  * examples/script.py renames title->name).
  *
  * Spark-native: a typed `Dataset.map` with an explicit output
  * encoder replaces the reference's run-1000-records-then-rescan
  * schema discovery — the encoder IS the schema, checked at compile
  * time.
  */
object Transform {

  def applyTyped[T, U: Encoder](ds: Dataset[T], f: T => U): Dataset[U] =
    ds.map(f)(implicitly[Encoder[U]])

  /** Two-pass variant mirroring the reference shape for dynamic
    * (DataFrame) inputs: caller supplies a Row->Row function and the
    * output schema (what the reference inferred from a 1000-row
    * sample).
    */
  def applyRows(df: org.apache.spark.sql.DataFrame,
                schema: org.apache.spark.sql.types.StructType,
                f: org.apache.spark.sql.Row => org.apache.spark.sql.Row): org.apache.spark.sql.DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.map(f)(enc)
  }
}
