package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed join = no shuffle: the 100-TB co-location property,
  * asserted on the physical plan.
  */
class BucketingSpec extends SparkSpecBase {

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    val s = spark
    import s.implicits._
    // one hot key carries ~95% of the fact side
    val fact = ((0 until 60000).map(_ => 7L) ++ (0 until 3000).map(i => (i % 50).toLong))
      .zipWithIndex.map { case (k, i) => (k, s"payload-$i-${"x" * 64}") }
      .toDF("k", "payload")
    val dim = (0 until 64).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val conf = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val j = fact.join(dim, "k")
      // execute THIS DataFrame's plan so its AQE run finalizes
      // (count() would spawn a separate QueryExecution)
      assert(j.collect().length == 63000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p.take(1500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

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
