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

  /** Range-bucketed as-of join — the hot-key scale form. `asofJoin`
    * windows per key, so one key's entire history serializes into a
    * single task; here time is cut into fixed `bucket`-width ranges
    * and the work splits into:
    *
    *  1. a within-(key, bucket) window pass — parallel across a hot
    *     key's buckets, each task holds one bucket's rows;
    *  2. a COMPACTED carry: per (key, bucket) the right side's
    *     closing row (max-ts), carried forward across buckets with
    *     the plain asofJoin — that table has one row per (key,
    *     non-empty bucket) plus one per queried left bucket, so the
    *     per-key window there is O(buckets), not O(rows);
    *  3. left rows with no within-bucket match take the previous
    *     bucket's carried close (a within-bucket match is always
    *     newer than any previous bucket's close, so coalesce picks
    *     correctly).
    *
    * Semantics identical to `asofJoin` (inclusive ties, matched-ROW
    * struct carry, right unique per (key, ts)); equality is
    * property-tested on random data. `ts` must cast to double
    * (numerics and timestamps both do). Pick `bucket` so a hot key's
    * densest bucket fits a task — the same knob as any range join.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame,
                       key: String, ts: String, bucket: Double,
                       suffix: String = "_asof"): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val rCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val lCols = left.columns.toSeq
    require(rCols.nonEmpty, "right side has no value columns")
    val rStructType = org.apache.spark.sql.types.StructType(
      rCols.map(c => right.schema(right.schema.fieldIndex(c))))
    // datetime types (incl. TIMESTAMP_NTZ, which refuses a direct
    // double cast) go through TIMESTAMP -> epoch seconds
    val tsIsDatetime = left.schema(ts).dataType match {
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType |
           _: org.apache.spark.sql.types.DateType => true
      case _ => false
    }
    def bkt(c: org.apache.spark.sql.Column) =
      if (tsIsDatetime) floor(c.cast("timestamp").cast("double") / bucket)
      else floor(c.cast("double") / bucket)

    // ---- 1. within-(key, bucket) pass (the asofJoin union trick,
    // with the bucket added to the window partition) ----------------
    val lt = left
      .select(lCols.map(col) :+ lit(1).as("__side")
        :+ lit(null).cast(rStructType).as("__r"): _*)
      .withColumn("__bkt", bkt(col(ts)))
    val rt = right
      .select(lCols.map(c =>
        if (c == key || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        :+ lit(0).as("__side")
        :+ struct(rCols.map(col): _*).as("__r"): _*)
      .withColumn("__bkt", bkt(col(ts)))
    val w = Window.partitionBy(col(key), col("__bkt"))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = lt.unionByName(rt)
      .withColumn("__rw", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    // ---- 2. compacted carry: per-(key, bucket) closing right row,
    // as-of'd (strictly-previous-bucket) onto the left buckets ------
    val close = right
      .withColumn("__bkt", bkt(col(ts)))
      .groupBy(col(key), col("__bkt"))
      .agg(max_by(struct(rCols.map(col): _*), col(ts)).as("__close"))
    val leftBuckets = within.select(col(key), col("__bkt")).distinct()
    // shift the close's "time" by +1 bucket: an inclusive as-of then
    // matches exactly the buckets strictly after the close's own
    val carried = asofJoin(
      leftBuckets.withColumn("__cbkt", col("__bkt")),
      close.select(col(key), (col("__bkt") + 1).as("__cbkt"),
        col("__close")),
      key, "__cbkt", suffix = "_carry")
      .select(col(key), col("__bkt"), col("__close_carry"))

    // ---- 3. combine (null-safe on key AND bucket: asofJoin's window
    // groups NULL keys / NULL ts together, so the carry delivery must
    // match them too or the bucketed form would diverge on NULLs) ----
    val carriedR = carried
      .withColumnRenamed(key, "__ck").withColumnRenamed("__bkt", "__cb")
    within.join(carriedR,
        col(key) <=> col("__ck") && col("__bkt") <=> col("__cb"), "left")
      .withColumn("__rf", coalesce(col("__rw"), col("__close_carry")))
      .select(lCols.map(col) ++
        rCols.map(c => col("__rf").getField(c).as(s"$c$suffix")): _*)
  }
}
