package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the engine's stream shape
  * (`user_id`, `ts`, `event_type`, `value` — the events table run as a
  * stream). The reference has no event-time processing (SURVEY §2.8);
  * these are the Structured Streaming extensions a production ingest
  * pipeline pairs with the [[GraftStream]] sink.
  *
  * Scale notes: both operators keyed-shuffle once on user/window; state
  * is bounded by the watermark (late data beyond it is dropped and its
  * state reclaimed), which is what keeps a 100 TB/day stream's state
  * store finite.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts per event type: the canonical
    * event-time aggregation. Emits finalized windows only (append mode
    * downstream) once the watermark passes the window end.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String = "ts",
                          windowLen: String = "10 minutes",
                          watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("value_sum"))

  /** Streaming exact dedup: the streaming counterpart of
    * [[graft.operators.Dedup.exact]]. Keys on a digest of the content
    * columns (so the state store holds hashes, not document bodies) and
    * drops repeats; with `tsCol` set the watermark bounds state — the
    * contract that keeps indefinite-run dedup state finite. Without a
    * watermark, state grows with distinct keys (bounded corpora only).
    */
  def dedupStream(events: DataFrame, contentCols: Seq[String],
                  tsCol: Option[String] = None,
                  watermark: String = "1 hour"): DataFrame = {
    val keyed = events.withColumn("_k",
      xxhash64(contentCols.map(c => col(c).cast("string")): _*))
    val deduped = tsCol match {
      // dedup on the CONTENT key only — dropDuplicates("_k", ts) would
      // treat identical content at different event times as distinct;
      // dropDuplicatesWithinWatermark keys state on _k and expires it
      // once the watermark passes
      case Some(ts) =>
        keyed.withWatermark(ts, watermark).dropDuplicatesWithinWatermark("_k")
      case None => keyed.dropDuplicates(Seq("_k"))
    }
    deduped.drop("_k")
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, lastSeen: Long, events: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, events: Long)

  /** Streaming sessionization with explicit state: a session closes
    * after `gapMs` of event-time inactivity (detected on the next
    * arrival) or via the processing-time timeout for idle users, and is
    * emitted exactly once — the stateful counterpart of the batch
    * sessionizer (q56). `flatMapGroupsWithState` keeps one small state
    * record per active user; closed sessions free their state.
    * `timeout` is parameterized so bounded test runs can use NoTimeout
    * (gap-on-arrival closure only).
    */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout()
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.events))
          } else {
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, events = s.events + 1))
                case Some(s) => // gap exceeded: close and start fresh
                  closed ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.events)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
