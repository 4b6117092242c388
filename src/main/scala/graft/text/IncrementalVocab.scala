package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GROW-ONLY versioned vocabulary for streaming tokenization.
  *
  * The offline tokenizer ranks the whole corpus once (`buildVocab`);
  * a stream cannot re-rank per micro-batch without breaking id
  * stability (the same word would tokenize differently across
  * batches, corrupting the encoded store). This store grows instead:
  * a word's id is assigned ONCE — `max existing id + frequency rank
  * within the batch's new words` — and never changes; already-encoded
  * batches stay valid forever.
  *
  * On-disk layout: `dir/v=N/` parquet snapshots of the FULL (w,
  * tok_id) table (vocabularies are lookup-table sized — full rewrite
  * beats a delta chain the loader would have to replay). A version is
  * visible iff its `_SUCCESS` marker exists; the loader reads the
  * highest visible version, so a crash mid-write leaves the previous
  * snapshot authoritative. Growth is IDEMPOTENT: re-running a batch
  * (foreachBatch retry) finds its words already assigned and writes
  * nothing — exactly-once tokenization composes with the encode
  * pipeline's commit markers. Single writer (the stream) by design.
  */
object IncrementalVocab {

  private def versions(dir: String): Seq[(Int, java.io.File)] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f => f.getName.drop(2).toIntOption.map(_ -> f))
      .sortBy(_._1)
      .toSeq

  /** Newest committed snapshot as word -> id (empty map when none). */
  def load(spark: SparkSession, dir: String): Map[String, Int] =
    versions(dir).lastOption match {
      case None => Map.empty
      case Some((_, f)) =>
        spark.read.parquet(f.getAbsolutePath).collect()
          .map(r => (r.getAs[String]("w"), r.getAs[Int]("tok_id"))).toMap
    }

  /** Assign ids to `wordCounts`' unseen words (frequency desc, word
    * asc — deterministic) up to `maxVocab` total entries, persist a
    * new snapshot iff anything changed, and return the merged map.
    * Words beyond the cap stay OOV for every batch — the cap is what
    * bounds driver/broadcast memory for the stream's lifetime.
    */
  def grow(spark: SparkSession, dir: String,
           wordCounts: Seq[(String, Long)],
           maxVocab: Int): Map[String, Int] = {
    val current = load(spark, dir)
    val room = maxVocab - current.size
    if (room <= 0) return current
    val fresh = wordCounts
      .filter { case (w, _) => !current.contains(w) }
      .sortBy { case (w, n) => (-n, w) }
      .take(room)
    if (fresh.isEmpty) return current
    val base = if (current.isEmpty) 0 else current.values.max + 1
    val merged = current ++ fresh.zipWithIndex.map { case ((w, _), i) => w -> (base + i) }
    val next = versions(dir).lastOption.map(_._1 + 1).getOrElse(0)
    import spark.implicits._
    merged.toSeq.sortBy(_._2).toDF("w", "tok_id")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v=$next")
    merged
  }

  /** The batch's word counts, bounded for the driver: at most
    * `limit` distinct words (frequency desc) are considered for
    * vocabulary growth per batch — a map-side-combined count, never
    * an unbounded collect.
    */
  def batchWordCounts(batch: DataFrame, textCol: String,
                      limit: Int): Seq[(String, Long)] =
    batch.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        w => w =!= lit(""))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(limit)
      .collect()
      .toSeq
      .map(r => (r.getString(0), r.getLong(1)))
}
