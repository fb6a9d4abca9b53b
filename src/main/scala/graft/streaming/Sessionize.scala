package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators (beyond the reference, which has no
  * streaming at all — SURVEY §2.8): event sessionization with a gap
  * timeout, expressed with `flatMapGroupsWithState` custom state.
  *
  * Scale shape: state is partitioned by user key across the cluster's state
  * store; each micro-batch touches only the keys present in the batch plus
  * timed-out keys. The same code runs over a bounded source with
  * `Trigger.AvailableNow` for batch-incremental sessionization.
  */
object Sessionize {

  final case class Event(userId: Long, tsMs: Long, value: Double)
  final case class SessionState(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long, sumValue: Double)

  /** Close a session when the gap between consecutive events of a user
    * exceeds `gapMs`. Emits CLOSED sessions only (Append semantics);
    * closure is event-driven — the trailing open session of a key flushes
    * when that key's next out-of-gap event arrives. (A production variant
    * would add EventTimeTimeout + watermark to flush idle keys; the
    * event-driven core is identical.)
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, evts, state: GroupState[SessionState]) =>
          // materializes ONE key's events of ONE micro-batch — bounded by
          // batch granularity (per-key per-batch volume), not stream length
          val sorted = evts.toSeq.sortBy(_.tsMs)
          val closed = Seq.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMs - s.endMs <= gapMs =>
                // min/max merge: a late event from a later micro-batch that
                // falls inside the carried session must never REWIND its end
                // (or move its start forward)
                cur = Some(s.copy(
                  startMs = math.min(s.startMs, e.tsMs),
                  endMs = math.max(s.endMs, e.tsMs),
                  n = s.n + 1, sum = s.sum + e.value))
              case Some(s) =>
                closed += Session(userId, s.startMs, s.endMs, s.n, s.sum)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  final case class TimedEvent(
      userId: Long, tsMs: Long, value: Double, eventTime: java.sql.Timestamp)

  /** Production variant with EventTimeTimeout: identical gap semantics,
    * plus each key's TRAILING session flushes once the watermark passes
    * `endMs + gapMs` — idle keys emit without waiting for their next event
    * (the caveat of [[sessionize]]'s NoTimeout mode). Late events inside
    * the carried session merge with min/max like the base variant; events
    * later than the watermark delay may be dropped by the engine (standard
    * watermark contract).
    */
  def sessionizeWithTimeout(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .as[TimedEvent]
      .withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evts, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startMs, s.endMs, s.n, s.sum))
          } else {
            val sorted = evts.toSeq.sortBy(_.tsMs)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMs - s.endMs <= gapMs =>
                  cur = Some(s.copy(
                    startMs = math.min(s.startMs, e.tsMs),
                    endMs = math.max(s.endMs, e.tsMs),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, s.startMs, s.endMs, s.n, s.sum)
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush when the watermark passes the gap horizon of the
              // session's end
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
