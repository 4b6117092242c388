package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Bloom novelty prefilter: no false negatives ever, survivors equal
  * the exact-dedup answer, and the flagged share of genuinely novel
  * rows stays near the configured fpp.
  */
class BloomDedupSpec extends SparkSpecBase {

  private def corpus(n: Int, tag: String) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"$tag document body number $i with words"))
      .toDF("doc_id", "text")
  }

  test("no false negatives: every true dup is flagged, at any fpp") {
    val s = spark
    import s.implicits._
    val old = corpus(2000, "base")
    // batch: 500 exact dups + 500 whitespace/case variants (same doc
    // under exactDedup normalization) + 1000 novel
    val dups = old.where(col("doc_id") < 500)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val variants = old.where(col("doc_id") >= 500 && col("doc_id") < 1000)
      .select((col("doc_id") + 20000).as("doc_id"),
        upper(concat(lit("  "), col("text"), lit("   "))).as("text"))
    val novel = corpus(1000, "fresh")
      .select((col("doc_id") + 30000).as("doc_id"), col("text"))
    val batch = dups.unionByName(variants).unionByName(novel)
    for (fpp <- Seq(0.3, 0.01)) {
      val flagged = Dedup.bloomFlag(old, batch, "text", fpp = fpp)
      val missedExact = flagged.where(!col("maybe_dup") && col("doc_id") < 30000).count()
      assert(missedExact == 0, s"false negatives at fpp=$fpp")
    }
  }

  test("incrementalDedup == exact answer; novel false-positive share ~ fpp") {
    val s = spark
    import s.implicits._
    val old = corpus(3000, "base")
    val dups = old.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val novel = corpus(2000, "fresh")
      .select((col("doc_id") + 30000).as("doc_id"), col("text"))
    val batch = dups.unionByName(novel)
    val survivors = Dedup.incrementalDedup(old, batch, "text")
    // exactly the novel rows survive, each exactly once
    assert(survivors.count() == 2000)
    assert(survivors.where(col("doc_id") < 30000).count() == 0)
    assert(survivors.select("doc_id").distinct().count() == 2000)
    // flagged novel rows = bloom false positives; at fpp=0.01 over
    // 2000 novel docs expect ~20, assert a generous ceiling
    val fpCount = Dedup.bloomFlag(old, novel, "text")
      .where(col("maybe_dup")).count()
    assert(fpCount <= 200, s"false-positive share too high: $fpCount/2000")
  }

  test("expectedOldItems sizing hint is honored (no count job needed)") {
    val old = corpus(1000, "base")
    val batch = corpus(100, "fresh")
    val flagged = Dedup.bloomFlag(old, batch, "text", expectedOldItems = 1000)
    assert(flagged.where(col("maybe_dup")).count() <= 10)
  }
}
