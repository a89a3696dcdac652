package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode,
  TimerValues}

import graft.model.Schemas.Event

/** State blob for [[OrdinalStream.InactivityProcessor]].
  *
  * TOP-LEVEL by necessity, not style: Spark's generated state encoder
  * Janino-compiles accessor calls against the state class, and a
  * `private` case class nested in the enclosing object makes that
  * compilation fail ("No applicable constructor/method found ...
  * OrdinalStream$Acc.n()") — Spark silently falls back to an
  * INTERPRETED projection per state (de)serialization, a per-row tax
  * on the hot transformWithState path. Same rule as the V2 connector
  * classes: anything Spark reflects over ships as a public top-level
  * case class with multi-character field names.
  */
case class InactivityAcc(nEvents: Long, firstUs: Long, lastUs: Long,
                         timerMs: Long)

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

  private def assignOrdinals(key: Long, rows: Iterator[Event],
      counter: org.apache.spark.sql.streaming.ValueState[Long]): Iterator[SeqEvent] = {
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

  class OrdinalProcessor extends StatefulProcessor[Long, Event, SeqEvent] {
    @transient private var counter: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counter = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[SeqEvent] =
      assignOrdinals(key, rows, counter)
  }

  /** Warm-start variant ([[StatefulProcessorWithInitialState]]): the
    * counter is SEEDED from a batch dataset before the first
    * micro-batch — the state-bootstrap path for migrating a running
    * pipeline onto this operator without renumbering history (the
    * streaming analogue of resuming from a batch checkpoint table).
    * `handleInitialState` runs once per seeded key; unseeded keys
    * start at 0 as usual.
    */
  class SeededOrdinalProcessor
      extends StatefulProcessorWithInitialState[Long, Event, SeqEvent, Long] {
    @transient private var counter: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counter = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInitialState(key: Long, seed: Long, tv: TimerValues): Unit =
      counter.update(seed)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[SeqEvent] =
      assignOrdinals(key, rows, counter)
  }

  /** Warm-start ordinals: per-user counters seeded from a batch
    * `(user_id, last_assigned_seq)` dataset before the first
    * micro-batch; unseeded users start at 0.
    */
  def seededOrdinals(events: Dataset[Event],
                     seeds: Dataset[(Long, Long)]): Dataset[SeqEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SeededOrdinalProcessor,
        TimeMode.None(), OutputMode.Append(),
        seeds.groupByKey(_._1).mapValues(_._2))
  }

  /** Streaming (or batch-replayed) per-user ordinal assignment. */
  def ordinals(events: Dataset[Event]): Dataset[SeqEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new OrdinalProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class UserSummary(user_id: Long, n_events: Long,
                         first_us: Long, last_us: Long)

  /** The EVENT-TIME-TIMER side of the new API (`handleExpiredTimer`,
    * which [[OrdinalProcessor]] never reaches under `TimeMode.None`):
    * per-user activity summaries finalized by INACTIVITY — each batch
    * re-arms a single timer at `last event + gapMs`, deleting the
    * previous one (`registerTimer`/`deleteTimer`, so exactly one timer
    * per live key), and when the WATERMARK passes the armed expiry the
    * summary is emitted from `handleExpiredTimer` and the state
    * cleared — the timer, not data arrival, drives emission, which is
    * what distinguishes this from every other stateful operator here.
    * Micros→ms uses ceil (the [[FunnelStream]] truncation lesson): a
    * timer must never be armed BEFORE the sub-ms event time it covers.
    */
  class InactivityProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, UserSummary] {
    @transient private var acc: org.apache.spark.sql.streaming.ValueState[InactivityAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[InactivityAcc]("acc",
        Encoders.product[InactivityAcc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[UserSummary] = {
      val evs = rows.toVector
      val lo = evs.map(e => toMicros(e.ts)).min
      val hi = evs.map(e => toMicros(e.ts)).max
      val prev = if (acc.exists()) Option(acc.get()) else None
      prev.foreach(a => getHandle.deleteTimer(a.timerMs))
      val merged = prev match {
        case Some(a) => InactivityAcc(a.nEvents + evs.size, math.min(a.firstUs, lo),
          math.max(a.lastUs, hi), 0L)
        case None => InactivityAcc(evs.size.toLong, lo, hi, 0L)
      }
      val timerMs = (math.max(merged.lastUs, hi) + 999L) / 1000L + gapMs
      getHandle.registerTimer(timerMs)
      acc.update(merged.copy(timerMs = timerMs))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[UserSummary] = {
      val out =
        if (acc.exists()) {
          val a = acc.get()
          Iterator.single(UserSummary(key, a.nEvents, a.firstUs, a.lastUs))
        } else Iterator.empty
      acc.clear()
      out
    }
  }

  /** Inactivity-finalized per-user summaries (event-time timers).
    * Callers must set a watermark on `ts` upstream — the watermark is
    * what expires timers.
    */
  def inactivitySummaries(events: Dataset[Event], gapMs: Long): Dataset[UserSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new InactivityProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
