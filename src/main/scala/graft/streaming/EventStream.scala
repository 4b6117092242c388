package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` table shape.
  *
  * The reference has NO event-time streaming (SURVEY.md §2.10 — its
  * "streaming" is bounded constant-memory file iteration), so this
  * module is an extension, not a port: watermarked tumbling-window
  * aggregation and stateful sessionization, the two shapes a
  * training-data ingest pipeline actually runs (late events dropped
  * deterministically, state bounded by the watermark).
  */
object EventStream {

  /** Tumbling-window counts+sums per event_type with a watermark:
    * works identically on a batch DataFrame (tests run it both ways).
    */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val wm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    wm.groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Streaming exact dedup: keep the first arrival per key, with
    * state BOUNDED by the watermark (`dropDuplicatesWithinWatermark`
    * — a duplicate arriving within the watermark delay of its
    * original is dropped; state for older keys is evicted, so an
    * unbounded ingest never accumulates unbounded dedup state). This
    * is the ingest-side complement of the batch `Dedup.exactDedup`:
    * dedup-at-arrival during streaming encode ingest, exact dedup in
    * the batch pipeline. On a batch DataFrame it degrades to plain
    * dropDuplicates (exact, no state concern).
    */
  def streamingDedup(df: DataFrame, keyCols: Seq[String],
                     tsCol: String = "ts",
                     watermark: String = "1 hour"): DataFrame =
    if (df.isStreaming)
      df.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else df.dropDuplicates(keyCols)

  /** Gap-based sessionization as a BATCH plan: lag + cumulative-sum
    * window, then one aggregate per session — the scale-correct batch
    * form (two window passes over a user-partitioned sort, no state
    * buffering; `sessionize` below buffers a user's whole batch in
    * memory, which is only safe under streaming micro-batches).
    * Emits ALL sessions including each user's last; epoch-second
    * timestamps (cast truncates, matching DuckDB floor(epoch(ts))).
    */
  def sessionizeBatch(events: DataFrame, gapSecs: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // NTZ parquet timestamps need the intermediate cast (session tz
      // is pinned UTC, so this equals DuckDB's epoch(ts))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("timestamp").cast("long").as("t"))
      .withColumn("__new",
        when(col("t") - lag("t", 1).over(byUser) > gapSecs
          || lag("t", 1).over(byUser).isNull, 1).otherwise(0))
      .withColumn("__sid", sum("__new").over(cum))
      .groupBy("user_id", "__sid")
      .agg(min("t").as("session_start"),
        (max("t") - min("t")).as("session_secs"),
        count(lit(1)).cast("long").as("events"))
      .select("user_id", "session_start", "session_secs", "events")
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: Long,
                              session_secs: Long, events: Int)

  /** Streaming sessionize with an EVENT-TIME TIMEOUT: like
    * `sessionize` below, but an open session also emits once the
    * watermark passes its last event + gap — without this, a user who
    * stops sending events leaves a session stuck in state forever
    * (exactly what `sessionize`'s NoTimeout form does; kept for batch
    * tests). State is bounded by the watermark: timed-out sessions
    * are removed.
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapSecs: Long = 1800,
                       watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessionOut(uid, st.start, st.last - st.start, st.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              if (st == null) st = SessionState(t, t, 1)
              else if (t - st.last > gapSecs) {
                out += SessionOut(uid, st.start, st.last - st.start, st.n)
                st = SessionState(t, t, 1)
              } else st = SessionState(math.min(st.start, t),
                // a late-but-in-gap event must never REGRESS the
                // window (min start / max last): last = t on an
                // out-of-order arrival shrank session_secs, re-armed
                // the timeout early, and falsely split on the next
                // in-order event
                math.max(st.last, t), st.n + 1)
            }
            if (st != null) {
              state.update(st)
              // close the session when the watermark passes last+gap;
              // Spark requires the timeout to sit beyond the current
              // watermark, so clamp upward if this batch already passed it
              val target = st.last * 1000 + gapSecs * 1000
              state.setTimeoutTimestamp(
                math.max(target, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Gap-based sessionization via flatMapGroupsWithState — the custom
    * stateful-operator surface. Emits a session when `gapSecs` of
    * silence passes between a user's consecutive events.
    */
  def sessionize(events: Dataset[SessionEvent], gapSecs: Long = 1800):
      Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            if (st == null) st = SessionState(t, t, 1)
            else if (t - st.last > gapSecs) {
              out += SessionOut(uid, st.start, st.last - st.start, st.n)
              st = SessionState(t, t, 1)
            } else st = SessionState(math.min(st.start, t),
                // a late-but-in-gap event must never REGRESS the
                // window (min start / max last): last = t on an
                // out-of-order arrival shrank session_secs, re-armed
                // the timeout early, and falsely split on the next
                // in-order event
                math.max(st.last, t), st.n + 1)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }
}
