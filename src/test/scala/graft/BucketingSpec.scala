package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed join = no shuffle: the 100-TB co-location property,
  * asserted on the physical plan.
  */
class BucketingSpec extends SparkSpecBase {

  test("same-bucketed tables join without an Exchange") {
    val s = spark
    import s.implicits._
    val docs = (0 until 1000).map(i => (i.toLong, s"text $i")).toDF("id", "text")
    val meta = (0 until 1000).map(i => (i.toLong, i % 7)).toDF("id", "grp")
    Bucketing.bucketedWrite(docs, "bkt_docs", "id", 8)
    Bucketing.bucketedWrite(meta, "bkt_meta", "id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about bucketing,
      // not about one side being broadcast-small
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.bucketedJoin(spark, "bkt_docs", "bkt_meta", "id")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p.take(1500))
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(j.count() == 1000)
      // and the same join on the raw (unbucketed) frames DOES shuffle
      val raw = docs.join(meta, "id")
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
      spark.sql("DROP TABLE IF EXISTS bkt_meta")
    }
  }
}
