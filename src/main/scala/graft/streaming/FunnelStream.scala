package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.Schemas.Event

/** Live conversion funnels with `flatMapGroupsWithState` — the
  * streaming twin of [[graft.operators.Funnel]]'s batch semantics:
  * stage k's time is the earliest stage-k event STRICTLY AFTER the
  * chosen stage-(k−1) time. Each completed stage is emitted exactly
  * once as an append-mode (user, stage, ts) record, as soon as the
  * watermark proves it final.
  *
  * Finality: the chain is extended greedily; candidate t_k (the min
  * eligible stage-k time seen) is FINAL once t_k ≤ watermark — any
  * surviving future event has ts ≥ watermark ≥ t_k, so it can neither
  * beat the min nor (since t_{k−1} is already final) change
  * eligibility.
  *
  * Bounded state: after the finalization loop stalls, every buffered
  * event at/below the watermark is provably useless and is dropped —
  * if a below-watermark stage-k event were still eligible (ts >
  * t_{k−1}) it would itself be a ≤-watermark candidate and would have
  * finalized; events of LATER stages need ts > t_{j−1} ≥ the stalled
  * candidate > watermark ≥ ts, a contradiction. So per-user state is
  * the finalized prefix (≤ |stages| longs) plus only above-watermark
  * events — the same horizon bound as [[Sessionize]].
  *
  * Bounded POPULATION: per-user size alone still lets state grow with
  * the number of ever-seen users — a user who stalls mid-funnel and
  * goes silent would otherwise be retained forever (no candidate ⇒ no
  * wake-up ever fires). So whenever the stall leaves NO finalizable
  * candidate, an abandonment timeout is registered at
  * `watermark + abandonMs`; if it fires with no progress the funnel is
  * declared abandoned and its state dropped. Semantics: a user idle
  * (in event time) longer than the horizon restarts from stage 0 —
  * the standard funnel-abandonment convention.
  */
object FunnelStream {

  case class StageHit(user_id: Long, stage: Int, stage_ts: Timestamp)

  /** finalized: chosen time per completed stage prefix;
    * pending: (ts, stageIdx) events still above the watermark.
    * All times are epoch MICROS — `Timestamp.getTime` alone would
    * truncate sub-millisecond event times and re-emit rounded stage
    * timestamps (the q48 oracle compares exact micros).
    */
  case class FunnelState(finalized: Vector[Long], pending: Vector[(Long, Int)])

  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming path. `stages` maps `event_type` values to funnel order;
    * events of other types are filtered out before the shuffle.
    * `abandonMs`: event-time idle horizon after which a stalled funnel's
    * state is dropped (see population bound in the object scaladoc).
    */
  def funnelStream(events: Dataset[Event], stages: Seq[String],
                   abandonMs: Long = 24L * 3600 * 1000): Dataset[StageHit] = {
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events.filter(e => stageIdx.contains(e.event_type))
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val incoming = it.map(e => (toMicros(e.ts), stageIdx(e.event_type))).toVector
          val st = state.getOption.getOrElse(FunnelState(Vector.empty, Vector.empty))
          val wmMs = state.getCurrentWatermarkMs()
          // watermark is millis; comparing in micros only DELAYS
          // finality for a sub-ms sliver (t ≤ wmUs ⇒ t ≤ wm) — sound
          val wmUs = wmMs * 1000L
          val buf = st.pending ++ incoming
          var fin = st.finalized
          val emitted = Vector.newBuilder[StageHit]
          var stalled = false
          while (!stalled && fin.length < stages.length) {
            val k = fin.length
            val prev = if (k == 0) Long.MinValue else fin(k - 1)
            val cand = buf.iterator
              .filter(x => x._2 == k && x._1 > prev).map(_._1)
              .minOption
            cand match {
              case Some(t) if t <= wmUs =>
                fin = fin :+ t
                emitted += StageHit(userId, k, fromMicros(t))
              case _ => stalled = true
            }
          }
          val progressed = fin.length > st.finalized.length
          if (fin.length == stages.length) {
            state.remove() // complete chain: nothing can change it
          } else {
            val keep = buf.filter(_._1 > wmUs) // see scaladoc proof
            // wake when the next candidate becomes finalizable
            val prev = if (fin.isEmpty) Long.MinValue else fin.last
            val nextWake = keep.iterator
              .filter(x => x._2 == fin.length && x._1 > prev).map(_._1)
              .minOption
            if (nextWake.isEmpty && incoming.isEmpty && !progressed
                && state.hasTimedOut) {
              // the abandonment timeout itself fired and nothing moved:
              // the user is idle past the horizon with no way forward.
              state.remove()
            } else {
              state.update(FunnelState(fin, keep))
              // a candidate wake always progresses on fire (t ≤ wm then),
              // so a no-candidate stall can only be woken by events or by
              // this abandonment fallback — without it, state would be
              // retained forever for users who go silent mid-funnel.
              // Ceil micros→millis so the wake is strictly past the
              // current watermark and covers the candidate when it fires.
              state.setTimeoutTimestamp(
                nextWake.map(t => (t + 999L) / 1000L).getOrElse(wmMs + abandonMs))
            }
          }
          emitted.result().iterator
      }
  }

  /** Batch twin: [[graft.operators.Funnel.stages]] melted to the same
    * (user, stage, ts) records — every stage the chain reaches (batch
    * input is complete, so everything is final). The streamed-≡-batch
    * oracle in StreamingSpec.
    */
  def funnelBatch(events: Dataset[Event], stages: Seq[String]): Dataset[StageHit] = {
    import events.sparkSession.implicits._
    val wide = graft.operators.Funnel.stages(
      events.toDF(), "user_id", "ts", "event_type", stages)
    wide.flatMap { r =>
      val uid = r.getLong(0)
      stages.indices.iterator
        .map(k => Option(r.getTimestamp(k + 1)).map(t => StageHit(uid, k, t)))
        .takeWhile(_.isDefined).flatten
    }
  }
}
