package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed (hash-clustered) table writes — the co-location tool for
  * repeated big-to-big joins at 100 TB: two tables bucketed by the
  * same key into the same bucket count join WITHOUT a shuffle (the
  * Exchange disappears from the plan; BucketingSpec asserts it), and
  * sortBy makes the merge side of the sort-merge join sort-free too.
  * The reference's only partitioning is file splits (SURVEY.md §2.7);
  * this is the shuffle-elision generalization for fact-fact joins the
  * encode pipeline's salted partitioning doesn't cover.
  *
  * Spark only honors bucketing metadata through the catalog, hence
  * saveAsTable rather than a bare path write.
  */
object Bucketing {

  def bucketedWrite(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: resolves from
    * the catalog so Spark sees the bucketing metadata.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
