package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Schemas.Event

/** Custom-state streaming: gap-based sessionization with
  * `flatMapGroupsWithState` (the stateful primitive beyond windowed
  * aggregation — SURVEY.md §2.7 notes the reference never needed it;
  * a training-data event pipeline does).
  *
  * A session = consecutive events of one user with gaps < `gapMinutes`;
  * closed sessions are emitted once (append semantics). State per user
  * is O(1) (open-session accumulator), and event-time timeout closes
  * idle sessions as the watermark advances — bounded state at any
  * throughput, the same contract as the windowed jobs.
  *
  * Works identically on a batch Dataset via [[sessionizeBatch]]
  * (sort-within-group implementation) — used as the oracle for the
  * streamed path in SessionizeSpec.
  */
object Sessionize {

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, total_value: Double)

  case class OpenSession(start: Long, end: Long, n: Long, valueSum: Double)

  /** Streaming path: event-time state with timeout. */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.valueSum))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end < gapMs =>
                  open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.valueSum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.valueSum)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch oracle: same session semantics via sort-within-group. Also
    * emits the final (still-open) session of each user, which the
    * streaming path only emits after timeout/end-of-stream.
    */
  def sessionizeBatch(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id).flatMapGroups { (userId, it) =>
      val sorted = it.toSeq.sortBy(_.ts.getTime)
      val out = Seq.newBuilder[Session]
      var open: Option[OpenSession] = None
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.end < gapMs =>
            open = Some(OpenSession(s.start, math.max(s.end, t), s.n + 1, s.valueSum + e.value))
          case Some(s) =>
            out += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.valueSum)
            open = Some(OpenSession(t, t, 1L, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1L, e.value))
        }
      }
      open.foreach(s => out += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.valueSum))
      out.result().iterator
    }
  }
}
