package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — points matched to intervals containing them
  * (`start <= t <= end`), the other time-series join Spark lacks as a
  * first-class operator (the reference has no joins at all, SURVEY.md
  * §2.4; naive `ON t BETWEEN start AND end` degenerates to a
  * broadcast-nested-loop or a cartesian filter).
  *
  * Physical form: intervals explode into the fixed-width buckets they
  * cover (`floor(start/bucket) .. floor(end/bucket)`), points bucket
  * once, and the match becomes an EQUI-join on (keys..., bucket) with
  * a residual between-filter — Catalyst then plans a hash join, and
  * the shuffle carries each interval once per covered bucket rather
  * than |points| x |intervals| pairs. Pick `bucket` near the typical
  * interval length: cost is O(span/bucket) replicas per interval vs
  * O(points-per-bucket) residual filtering — the standard
  * binning/fragmenting range-join recipe.
  *
  * `t`, `start`, `end` are numeric (e.g. epoch seconds). Bounds are
  * inclusive. Point and interval column names must be disjoint.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                tCol: String, startCol: String, endCol: String,
                bucket: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keyCols
    require(overlap.isEmpty, s"overlapping non-key columns: $overlap")
    val p = points.withColumn("__bkt", floor(col(tCol) / bucket))
    // an inverted interval (end < start) matches nothing, but
    // sequence(hi, lo) steps DOWNWARD — one corrupt row would explode
    // O(span/bucket) junk replicas before the residual filter kills
    // them; drop such rows up front instead
    val iv = intervals.where(col(startCol) <= col(endCol))
      .withColumn("__bkt",
        explode(sequence(floor(col(startCol) / bucket),
          floor(col(endCol) / bucket))))
    p.join(iv, keyCols :+ "__bkt")
      .where(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bkt")
  }

  /** Pre-flight probe: how many bucket replicas the interval side
    * will explode into under a given bucket width — one pathological
    * interval (a year-long span over 1-second buckets) replicates
    * O(span/bucket) times and dominates the join. Run this cheap
    * aggregate first; a huge max_span_buckets means widen `bucket` or
    * split the offending intervals.
    */
  def rangeJoinDiag(intervals: DataFrame, startCol: String, endCol: String,
                    bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    // inverted intervals are dropped by rangeJoin — a negative span
    // here would corrupt the totals the diag exists to surface
    val spans = greatest(
      floor(col(endCol) / bucket) - floor(col(startCol) / bucket) + 1, lit(0L))
    intervals.agg(
      count(lit(1)).cast("long").as("n_intervals"),
      max(spans).cast("long").as("max_span_buckets"),
      sum(spans).cast("long").as("total_replicas"))
  }
}
