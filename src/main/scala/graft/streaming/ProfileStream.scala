package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode}

import graft.model.Schemas.Event

/** Live per-user profiles on the remaining two typed state handles of
  * the `transformWithState` API ([[OrdinalStream]] covers `ValueState`
  * and timers): a [[MapState]] keyed by event type holding running
  * counts — point-updatable per entry, so a profile update touches ONE
  * RocksDB key-value, not a serialized blob of the whole map (the
  * reason MapState exists vs a ValueState[Map]) — and a bounded
  * [[ListState]] ring of the most recent event times.
  *
  * After each micro-batch a profile row is emitted per touched user:
  * total events, distinct types, the dominant type (max count, ties to
  * the lexicographically first — a total order), and the span of the
  * recent-event window. All exact integers; event times ride as epoch
  * micros (the FunnelStream lesson).
  */
object ProfileStream {

  val RecentKeep = 5

  case class UserProfile(user_id: Long, total_events: Long, n_types: Long,
                         top_type: String, top_count: Long,
                         recent_n: Long, recent_span_us: Long)

  private def toMicros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  class ProfileProcessor extends StatefulProcessor[Long, Event, UserProfile] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long]("recent",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: org.apache.spark.sql.streaming.TimerValues):
        Iterator[UserProfile] = {
      val evs = rows.toVector
      evs.groupBy(_.event_type).foreach { case (t, es) =>
        val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, prev + es.size) // ONE entry touched per type
      }
      val merged = ((if (recent.exists()) recent.get().toVector else Vector.empty)
        ++ evs.map(e => toMicros(e.ts))).sorted.takeRight(RecentKeep)
      recent.put(merged.toArray)
      val all = counts.iterator().toVector
      val total = all.map(_._2).sum
      // dominant type: max count, tie to lexicographically FIRST type
      val (topT, topC) = all.minBy { case (t, c) => (-c, t) }
      Iterator.single(UserProfile(key, total, all.size.toLong, topT, topC,
        merged.size.toLong, if (merged.isEmpty) 0L else merged.last - merged.head))
    }
  }

  /** Per-batch live profile emission (Append mode: one row per touched
    * user per micro-batch).
    */
  def profiles(events: Dataset[Event]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
