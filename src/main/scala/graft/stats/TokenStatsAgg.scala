package graft.stats

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.TokenRow

/** Table-level token statistics as a typed Dataset Aggregator — the
  * Spark-native rewrite of the reference's single-threaded stats
  * accumulator (undatum/cmds/statistics.py:54-110): its per-field dict
  * of counters becomes a mergeable buffer with partial aggregation on
  * every core/executor.
  *
  * Usage: `ds.groupByKey(_.source).agg(TokenStatsAgg.toColumn)` or
  * `ds.select(TokenStatsAgg.toColumn)` for the whole table.
  */
final case class TokenTableStats(
    rows: Long,
    totalTokens: Long,
    emptyDocs: Long,
    minTok: Int,
    maxTok: Int,
    minLen: Int,
    maxLen: Int,
    runs: Long,     // value-change runs across all docs (per-doc streams)
    maxRun: Int
) {
  def avgLen: Double = if (rows == 0) 0.0 else totalTokens.toDouble / rows
  def avgRun: Double = if (runs == 0) 0.0 else totalTokens.toDouble / runs
}

object TokenTableStats {
  val zero: TokenTableStats =
    TokenTableStats(0L, 0L, 0L, Int.MaxValue, Int.MinValue, Int.MaxValue, Int.MinValue, 0L, 0)
}

object TokenStatsAgg extends Aggregator[TokenRow, TokenTableStats, TokenTableStats] {
  def zero: TokenTableStats = TokenTableStats.zero

  def reduce(b: TokenTableStats, r: TokenRow): TokenTableStats = {
    val t = r.tokens
    var min = b.minTok; var max = b.maxTok
    var runs = 0L; var maxRun = b.maxRun; var cur = 0
    var i = 0
    while (i < t.length) {
      val v = t(i)
      if (v < min) min = v
      if (v > max) max = v
      if (i == 0 || v != t(i - 1)) { runs += 1; cur = 1 }
      else { cur += 1; if (cur > maxRun) maxRun = cur }
      i += 1
    }
    if (t.length > 0 && maxRun < 1) maxRun = 1
    TokenTableStats(
      b.rows + 1,
      b.totalTokens + t.length,
      b.emptyDocs + (if (t.isEmpty) 1L else 0L),
      min, max,
      math.min(b.minLen, t.length),
      math.max(b.maxLen, t.length),
      b.runs + runs,
      maxRun
    )
  }

  def merge(a: TokenTableStats, b: TokenTableStats): TokenTableStats =
    TokenTableStats(
      a.rows + b.rows,
      a.totalTokens + b.totalTokens,
      a.emptyDocs + b.emptyDocs,
      math.min(a.minTok, b.minTok),
      math.max(a.maxTok, b.maxTok),
      math.min(a.minLen, b.minLen),
      math.max(a.maxLen, b.maxLen),
      a.runs + b.runs,
      math.max(a.maxRun, b.maxRun)
    )

  def finish(b: TokenTableStats): TokenTableStats = b
  def bufferEncoder: Encoder[TokenTableStats] = Encoders.product[TokenTableStats]
  def outputEncoder: Encoder[TokenTableStats] = Encoders.product[TokenTableStats]
}
