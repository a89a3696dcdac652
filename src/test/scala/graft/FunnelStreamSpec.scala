package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Schemas.Event
import graft.streaming.FunnelStream

class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("funnel-stream-spec")

  private val Stages = Seq("view", "click", "purchase")

  private def ev(u: Long, kind: String, t: String) =
    Event(Timestamp.valueOf(t), kind, u, 1.0)

  private def runStream(batches: Seq[Seq[Event]]): Set[(Long, Int, Timestamp)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = scala.collection.mutable.ArrayBuffer[FunnelStream.StageHit]()
    val q = FunnelStream.funnelStream(mem.toDS(), Stages).writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-funnel").toString)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[FunnelStream.StageHit], _: Long) =>
        out ++= ds.collect(); ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    out.filter(_.user_id != 99).map(h => (h.user_id, h.stage, h.stage_ts)).toSet
  }

  private def batchSet(events: Seq[Event]): Set[(Long, Int, Timestamp)] = {
    import spark.implicits._
    FunnelStream.funnelBatch(events.filter(_.user_id != 99).toDS(), Stages)
      .collect().map(h => (h.user_id, h.stage, h.stage_ts)).toSet
  }

  test("streamed funnel emits exactly the batch chain, including abandonments") {
    // u1 converts fully; u2 clicks before viewing (stalls after view);
    // u3 views only. The far-future user 99 drives the watermark.
    val rows = Seq(
      ev(1, "view", "2024-03-01 10:00:00"), ev(1, "click", "2024-03-01 10:05:00"),
      ev(1, "purchase", "2024-03-01 10:20:00"),
      ev(2, "click", "2024-03-01 09:00:00"), ev(2, "view", "2024-03-01 09:30:00"),
      ev(3, "view", "2024-03-01 11:00:00"))
    val sentinel = Seq(ev(99, "view", "2024-03-03 00:00:00"),
      ev(99, "view", "2024-03-03 01:00:00"))
    val streamed = runStream(Seq(rows, sentinel))
    assert(streamed == batchSet(rows))
    assert(streamed.count(_._1 == 1L) == 3) // full conversion surfaced
    assert(streamed.filter(_._1 == 2L).map(_._2) == Set(0)) // stalled at view
  }

  test("cross-batch disorder: an earlier stage-1 event re-chains before finality") {
    // batch 1: view at 10:30 + click at 10:40 (wm still far behind);
    // batch 2 delivers an EARLIER view at 10:05 and a click at 10:10 —
    // the chain must finalize on (10:05 view, 10:10 click), which a
    // naive earliest-seen-first accumulator would get wrong
    val b1 = Seq(ev(1, "view", "2024-03-01 10:30:00"),
      ev(1, "click", "2024-03-01 10:40:00"),
      ev(99, "view", "2024-03-01 11:00:00")) // wm → 09:00
    val b2 = Seq(ev(1, "view", "2024-03-01 10:05:00"),
      ev(1, "click", "2024-03-01 10:10:00"))
    val sentinel = Seq(ev(99, "view", "2024-03-03 00:00:00"),
      ev(99, "view", "2024-03-03 01:00:00"))
    val streamed = runStream(Seq(b1, b2, sentinel))
    assert(streamed == batchSet(b1 ++ b2))
    assert(streamed.contains((1L, 0, Timestamp.valueOf("2024-03-01 10:05:00"))))
    assert(streamed.contains((1L, 1, Timestamp.valueOf("2024-03-01 10:10:00"))))
  }

  test("stage records never emit before the watermark proves them final") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = scala.collection.mutable.ArrayBuffer[FunnelStream.StageHit]()
    val q = FunnelStream.funnelStream(mem.toDS(), Stages).writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-funnel2").toString)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[FunnelStream.StageHit], _: Long) =>
        out ++= ds.collect(); ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    mem.addData(ev(1, "view", "2024-03-01 10:00:00"))
    q.processAllAvailable()
    // watermark hasn't passed 10:00 yet — nothing may be emitted, because
    // an earlier view could still arrive and re-chain
    assert(out.isEmpty)
    mem.addData(ev(99, "view", "2024-03-01 13:00:00")) // wm → 11:00
    mem.addData(ev(99, "view", "2024-03-01 14:00:00"))
    q.processAllAvailable()
    q.stop()
    assert(out.map(h => (h.user_id, h.stage)).toSeq == Seq((1L, 0)))
  }

  test("abandonment horizon drops stalled state; an idle user restarts from stage 0") {
    // u1 views, finalizes stage 0, then goes silent with NO stage-1
    // candidate — so no candidate wake exists and only the abandonment
    // timeout can release the state. After the horizon passes, a fresh
    // view must re-open the funnel from stage 0 (second stage-0 hit);
    // with an effectively-infinite horizon the retained prefix swallows
    // the second view (stage 0 already finalized) — proving the timeout,
    // not batch mechanics, is what releases the state.
    def run(abandonMs: Long): Seq[(Long, Int, Timestamp)] = {
      import spark.implicits._
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Event]
      val out = scala.collection.mutable.ArrayBuffer[FunnelStream.StageHit]()
      val q = FunnelStream.funnelStream(mem.toDS(), Stages, abandonMs).writeStream
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("ckpt-funnel3").toString)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[FunnelStream.StageHit], _: Long) =>
          out ++= ds.collect(); ()
        }
        .trigger(Trigger.ProcessingTime(0))
        .start()
      val batches = Seq(
        Seq(ev(1, "view", "2024-03-01 10:00:00"),
          ev(99, "view", "2024-03-01 14:00:00")), // wm → 12:00, stage 0 final
        Seq(ev(99, "view", "2024-03-04 00:00:00")), // wm → 03-03 22:00 > 12:00+24h
        Seq(ev(99, "view", "2024-03-04 01:00:00")), // timeout fires → state dropped
        Seq(ev(1, "view", "2024-03-04 02:00:00"),   // fresh chain (if dropped)
          ev(99, "view", "2024-03-06 00:00:00")),
        Seq(ev(99, "view", "2024-03-06 01:00:00")))
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      out.filter(_.user_id != 99).map(h => (h.user_id, h.stage, h.stage_ts)).toSeq
    }
    val dropped = run(24L * 3600 * 1000)
    assert(dropped == Seq(
      (1L, 0, Timestamp.valueOf("2024-03-01 10:00:00")),
      (1L, 0, Timestamp.valueOf("2024-03-04 02:00:00"))))
    val retained = run(Long.MaxValue / 4)
    assert(retained == Seq((1L, 0, Timestamp.valueOf("2024-03-01 10:00:00"))))
  }
}
