package graft.tools

import java.sql.Timestamp
import graft.GraftSession
import graft.model.Schemas.Event
import graft.operators.Dedup
import graft.streaming.Sessionize
import org.apache.spark.sql.functions.col

/** Demo main: gap sessionization (batch semantics) + near-dup
  * component clustering, driven through the library surface.
  */
object SessionDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("session-demo")
    import spark.implicits._
    val evs = Seq(
      Event(Timestamp.valueOf("2024-03-01 10:00:00"), "c", 1L, 2.0),
      Event(Timestamp.valueOf("2024-03-01 10:10:00"), "c", 1L, 3.0),
      Event(Timestamp.valueOf("2024-03-01 12:00:00"), "c", 1L, 4.0)).toDS()
    println("SESSIONS=" + Sessionize.sessionizeBatch(evs, 30)
      .collect().sortBy(_.session_start.getTime).toList)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    println("LABELS=" + Dedup.clusterPairs(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList)
    println("DEDUPED=" + Dedup.dedupByPairs(
      Seq(1L, 2L, 3L, 7L, 8L, 9L).toDF("doc_id"), col("doc_id"), pairs)
      .collect().map(_.getLong(0)).sorted.toList)
    val dup = Event(Timestamp.valueOf("2024-03-01 10:00:00"), "c", 1L, 2.0)
    println("STREAM_DEDUP=" + graft.streaming.StreamJobs
      .dedupEvents(Seq(dup, dup, dup, evs.collect()(2)).toDS().toDF(),
        Seq("user_id", "event_type", "ts")).count())
    spark.stop()
  }
}
