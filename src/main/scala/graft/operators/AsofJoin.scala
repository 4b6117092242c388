package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * right.ts <= left.ts for the same key (the time-series/feature-store
  * join Spark lacks as a built-in; reference has no joins at all,
  * SURVEY.md §2.4).
  *
  * Physical form: union both sides tagged, ONE shuffle partitioned by
  * key, one sorted window pass carrying the latest right values
  * forward (`last(..., ignoreNulls)` over rows-unbounded-preceding),
  * then keep left rows. This is the scale-correct shape — a naive
  * range join explodes to |L|x|R| per key before filtering; this is
  * O((|L|+|R|) log) with no pair materialization. Hot keys serialize
  * into one task (Window semantics); shard the key externally if one
  * key exceeds a task.
  *
  * Contract: right must be unique per (key, ts) — pre-aggregate
  * otherwise (same requirement DuckDB's ASOF JOIN places). Ties
  * (right.ts == left.ts) match, i.e. the inequality is inclusive.
  *
  * NULL semantics: the right row's value columns are packed into ONE
  * struct before the window fill, so the carry-forward selects a
  * whole right ROW — the struct is non-null for every right row even
  * when its fields are NULL. A matched right row with a NULL value
  * therefore yields NULL (exactly what a real ASOF JOIN returns), and
  * multiple value columns always come from the SAME matched row. A
  * per-column `last(ignoreNulls)` fill would instead leak an older
  * non-null value through a matched NULL, and could mix columns from
  * different right rows.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String,
               suffix: String = "_asof"): DataFrame = {
    val rCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val lCols = left.columns.toSeq
    require(rCols.nonEmpty, "right side has no value columns")
    val rStructType = org.apache.spark.sql.types.StructType(
      rCols.map(c => right.schema(right.schema.fieldIndex(c))))
    val lt = left
      .select(lCols.map(col) :+ lit(1).as("__side")
        :+ lit(null).cast(rStructType).as("__r"): _*)
    val rt = right
      .select(lCols.map(c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        :+ lit(0).as("__side")
        :+ struct(rCols.map(col): _*).as("__r"): _*)
    // right rows sort before left rows at equal ts (side 0 < 1), so a
    // same-timestamp right row is visible to the left row — inclusive
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lt.unionByName(rt)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    filled.where(col("__side") === 1)
      .select(lCols.map(col) ++
        rCols.map(c => col("__r").getField(c).as(s"$c$suffix")): _*)
  }
}
