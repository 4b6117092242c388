package graft.encode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate documents in a fixed order
  * and cut every `seqLen` tokens — the standard "concat-and-chunk"
  * shaping step before pretraining (each produced sequence is exactly
  * seqLen tokens; a document may straddle a cut). The reference has
  * no notion of this; it belongs to the LLM-pipeline extension
  * surface alongside dedup/quality/encode.
  *
  * Declarative form: one window cumulative sum per pack group —
  * seq_first = the chunk holding the doc's first token,
  * seq_last = the chunk holding its last; a doc is "split" when they
  * differ. No token arrays move: the plan reads only n_tok, so at
  * 10^12 rows the shuffle carries (group, id, n_tok) scalars. The
  * window serializes each pack group into one task (same caveat as
  * any ordered packing); pack per (source, shard) when one group
  * outgrows a task — chunk ids then number within the shard.
  *
  * The order within a group is the caller's id column (deterministic
  * packing = reproducible training mix); empty docs (n_tok = 0) pass
  * through with a zero-width span (seq_last = seq_first - 1 would be
  * nonsense, so they pin to the chunk at their cursor position with
  * spans = 0).
  */
object Packing {

  /** (grp, id, n_tok, cum) -> the packed-span projection shared by the
    * plain and bucketed forms.
    */
  private def spansFromCum(withCum: DataFrame, seqLen: Int): DataFrame =
    withCum.select(
        col("grp"), col("id"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / seqLen).as("seq_first"),
        when(col("n_tok") > 0, floor((col("cum") - 1) / seqLen))
          .otherwise(floor((col("cum") - col("n_tok")) / seqLen)).as("seq_last"))
      .withColumn("spans",
        when(col("n_tok") > 0, col("seq_last") - col("seq_first") + 1)
          .otherwise(lit(0L)))

  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
                    groupCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spansFromCum(
      df.select(col(groupCol).as("grp"), col(idCol).as("id"),
          col(nTokCol).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w)),
      seqLen)
  }

  /** Scale form of [[packSequences]] for NUMERIC ids, identical rows:
    * the per-group cumsum above serializes a dominant group into one
    * task. Here sampled id cut points range-bucket each group's order
    * (bucket index = #cuts ≤ id is monotone in id whatever the sample
    * quality — cut skew costs balance, never correctness), per-bucket
    * subtotals roll up in a ≤`buckets`-row window, and the global
    * cumsum is offset + within-bucket cumsum.
    */
  def packSequencesBucketed(df: DataFrame, idCol: String, nTokCol: String,
                            groupCol: String, seqLen: Int,
                            buckets: Int = 256): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(buckets > 1, "need at least 2 buckets")
    val base = df.select(col(groupCol).as("grp"),
      col(idCol).cast("long").as("id"),
      col(nTokCol).cast("long").as("n_tok"))
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts = base.stat.approxQuantile("id", probs, 0.01)
      .map(_.toLong).distinct.sorted
    val bc = df.sparkSession.sparkContext.broadcast(cuts)
    val bktOf = udf((id: Long) => {
      var lo = 0; var hi = bc.value.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (bc.value(m) <= id) lo = m + 1 else hi = m
      }
      lo
    })
    val keyed = base.withColumn("__bkt", bktOf(col("id")))
    val wB = Window.partitionBy(col("grp")).orderBy(col("__bkt"))
    val offsets = keyed.groupBy(col("grp"), col("__bkt"))
      .agg(sum(col("n_tok")).as("__bt"))
      .withColumn("__off",
        coalesce(sum(col("__bt")).over(wB) - col("__bt"), lit(0L)))
      .select(col("grp"), col("__bkt"), col("__off"))
    val wIn = Window.partitionBy(col("grp"), col("__bkt")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spansFromCum(
      keyed.join(offsets, Seq("grp", "__bkt"))
        .withColumn("cum", col("__off") + sum(col("n_tok")).over(wIn)),
      seqLen)
  }

  /** Per-group packing summary: sequences produced (full chunks plus
    * a trailing partial), docs packed, docs cut by a chunk boundary.
    */
  def packingStats(df: DataFrame, idCol: String, nTokCol: String,
                   groupCol: String, seqLen: Int): DataFrame =
    packSequences(df, idCol, nTokCol, groupCol, seqLen)
      .groupBy(col("grp"))
      .agg(
        (ceil(sum(col("n_tok")) / lit(seqLen.toDouble))).cast("long").as("n_seqs"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("spans") > 1, 1L).otherwise(0L)).as("split_docs"))
}
