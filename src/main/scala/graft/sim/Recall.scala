package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured ANN recall vs the exact brute-force baseline.
  *
  * The DuckDB oracles verify that each ANN path scores its restricted
  * scan EXACTLY (the deterministic contract); recall — how much of the
  * true top-k the restriction keeps — is probabilistic by design and
  * so must be MEASURED, not oracled. This helper computes ground truth
  * once per query set via `Similarity.bruteTopKBatch` (one corpus
  * scan for all queries) and scores any ANN method's id sets against
  * it; `Bench` reports the numbers as `ann_recall_*` so every round's
  * artifact carries the recall evidence at bench scale rather than
  * only a toy-scale property test.
  */
object Recall {

  /** Deterministic query sample: the `q` lowest-id vectors of the
    * corpus itself (self-queries make ground truth non-degenerate —
    * every query has at least one perfect neighbor).
    */
  def sampleQueries(df: DataFrame, vecCol: String, idCol: String,
                    q: Int): Seq[(Long, Array[Float])] =
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .where(col("v").isNotNull)
      .orderBy(col("id"))
      .limit(q)
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Exact top-k ids per query — ONE batched corpus scan. */
  def truthAtK(corpus: DataFrame, vecCol: String, idCol: String,
               queries: Seq[(Long, Array[Float])], k: Int): Map[Long, Set[Long]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("qid", "qvec")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    Similarity.bruteTopKBatch(corpus, vecCol, idCol, qdf, "qid", "qvec", k)
      .select(col("qid"), col(idCol).cast("long").as("id"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
  }

  /** Mean per-query recall: |got ∩ truth| / |truth|. Queries absent
    * from `got` (ANN returned nothing) count as zero recall — an ANN
    * path that scans an empty bucket must not be graded as skipped.
    */
  def recallOf(truth: Map[Long, Set[Long]],
               got: Map[Long, Set[Long]]): Double = {
    if (truth.isEmpty) return 0.0
    val per = truth.map { case (qid, t) =>
      val g = got.getOrElse(qid, Set.empty)
      if (t.isEmpty) 1.0 else g.intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  /** Recall of a per-query ANN method (e.g. `Similarity.annTopK`). */
  def measure(corpus: DataFrame, vecCol: String, idCol: String,
              queries: Seq[(Long, Array[Float])], k: Int)
             (annTopIds: (Long, Array[Float]) => Seq[Long]): Double = {
    val truth = truthAtK(corpus, vecCol, idCol, queries, k)
    val got = queries.map { case (qid, qv) =>
      qid -> annTopIds(qid, qv).toSet
    }.toMap
    recallOf(truth, got)
  }
}
