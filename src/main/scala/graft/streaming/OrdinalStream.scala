package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues}

import graft.model.Schemas.Event

/** Per-user event ordinals on the NEW arbitrary-state API
  * (`transformWithState`, Spark 4) — the successor of
  * `flatMapGroupsWithState` that [[FunnelStream]] uses: state lives in
  * named typed handles (`ValueState`/`ListState`/`MapState`, optional
  * TTL) on the RocksDB state store, instead of one opaque case-class
  * blob per key.
  *
  * The operator itself is the streaming "assign a stable per-key
  * sequence number" primitive (event ordinals feed per-user sampling,
  * first-N caps, and change-log versioning): per user, events get
  * consecutive ordinals starting at 1, persisted across micro-batches
  * in a single `ValueState[Long]` counter — O(1) state per user, the
  * smallest possible stateful footprint.
  *
  * Determinism contract: within a micro-batch the input iterator
  * arrives in ARRIVAL order, so rows are buffered and sorted by
  * (event time, type, value) before ordinals are assigned. Ordinals
  * are therefore a pure function of the per-batch event sets — exactly
  * reproducible by a batch `row_number` when the replay delivers one
  * batch, and stable under any executor parallelism. Event times ride
  * as exact epoch micros (the [[FunnelStream]] lesson).
  */
object OrdinalStream {

  case class SeqEvent(user_id: Long, seq: Long, ts_us: Long,
                      event_type: String, value: Double)

  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  class OrdinalProcessor extends StatefulProcessor[Long, Event, SeqEvent] {
    @transient private var counter: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counter = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[SeqEvent] = {
      val sorted = rows.toVector
        .sortBy(e => (toMicros(e.ts), e.event_type, e.value))
      var n = if (counter.exists()) counter.get() else 0L
      val out = sorted.map { e =>
        n += 1
        SeqEvent(key, n, toMicros(e.ts), e.event_type, e.value)
      }
      counter.update(n)
      out.iterator
    }
  }

  /** Streaming (or batch-replayed) per-user ordinal assignment. */
  def ordinals(events: Dataset[Event]): Dataset[SeqEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new OrdinalProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
