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

  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
                    groupCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(nTokCol).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(
        col("grp"), col("id"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / seqLen).as("seq_first"),
        when(col("n_tok") > 0, floor((col("cum") - 1) / seqLen))
          .otherwise(floor((col("cum") - col("n_tok")) / seqLen)).as("seq_last"))
      .withColumn("spans",
        when(col("n_tok") > 0, col("seq_last") - col("seq_first") + 1)
          .otherwise(lit(0L)))
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
