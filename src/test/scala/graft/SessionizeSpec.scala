package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Schemas.Event
import graft.operators.Dedup
import graft.streaming.Sessionize

class SessionizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("sessionize-spec")

  def ev(u: Long, t: String, v: Double = 1.0) =
    Event(Timestamp.valueOf(t), "click", u, v)

  test("batch sessionization: 30-min gap splits sessions") {
    import spark.implicits._
    val events = Seq(
      ev(1, "2024-03-01 10:00:00", 2.0), ev(1, "2024-03-01 10:10:00", 3.0),
      ev(1, "2024-03-01 11:00:00", 4.0), // 50-min gap → new session
      ev(2, "2024-03-01 10:05:00", 1.0)).toDS()
    val s = Sessionize.sessionizeBatch(events, 30).collect()
      .sortBy(x => (x.user_id, x.session_start.getTime))
    assert(s.length == 3)
    assert(s(0).n_events == 2 && s(0).total_value == 5.0)
    assert(s(0).session_end == Timestamp.valueOf("2024-03-01 10:10:00"))
    assert(s(1).n_events == 1 && s(1).session_start == Timestamp.valueOf("2024-03-01 11:00:00"))
    assert(s(2).user_id == 2)
  }

  test("streamed sessionization emits the same closed sessions as batch") {
    import spark.implicits._
    val rows = Seq(
      ev(1, "2024-03-01 10:00:00", 2.0), ev(1, "2024-03-01 10:10:00", 3.0),
      ev(1, "2024-03-01 11:00:00", 4.0),
      ev(2, "2024-03-01 10:05:00", 1.0),
      // far-future event pushes the watermark so earlier sessions time out
      ev(99, "2024-03-02 09:00:00", 0.0))
    val batch = Sessionize.sessionizeBatch(rows.toDS(), 30).collect()
      .filter(_.user_id != 99)
      .map(s => (s.user_id, s.session_start, s.n_events, s.total_value)).toSet

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = scala.collection.mutable.ArrayBuffer[Sessionize.Session]()
    val q = Sessionize.sessionizeStream(mem.toDS(), 30).writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-sess").toString)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Sessionize.Session], _: Long) =>
        out ++= ds.collect(); ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    mem.addData(rows.take(4): _*)
    q.processAllAvailable()
    mem.addData(rows(4)) // advance watermark → event-time timeouts fire
    q.processAllAvailable()
    // one more empty-ish batch so timed-out state flushes
    mem.addData(ev(99, "2024-03-02 10:00:00", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = out.filter(_.user_id != 99)
      .map(s => (s.user_id, s.session_start, s.n_events, s.total_value)).toSet
    assert(streamed == batch)
  }

  test("streamed sessionization: cross-batch out-of-order events extend sessions backwards") {
    import spark.implicits._
    val batch1 = Seq(
      ev(1, "2024-03-01 10:30:00", 1.0),
      ev(3, "2024-03-01 12:00:00", 5.0)) // also sets watermark = 10:00
    val batch2 = Seq(
      // 24 min BEFORE user 1's open session start, within gap → must
      // merge and extend session_start backwards (the round-1 bug:
      // an O(1) accumulator absorbed it without moving the start)
      ev(1, "2024-03-01 10:06:00", 2.0),
      // >30 min before user 3's session → a separate earlier session
      ev(3, "2024-03-01 10:01:00", 7.0))
    val all = batch1 ++ batch2
    val batch = Sessionize.sessionizeBatch(all.toDS(), 30).collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = scala.collection.mutable.ArrayBuffer[Sessionize.Session]()
    val q = Sessionize.sessionizeStream(mem.toDS(), 30).writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-sess-ooo").toString)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Sessionize.Session], _: Long) =>
        out ++= ds.collect(); ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    mem.addData(ev(99, "2024-03-03 09:00:00", 0.0)) // flush via watermark
    q.processAllAvailable()
    mem.addData(ev(99, "2024-03-03 10:00:00", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = out.filter(_.user_id != 99)
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet
    assert(streamed == batch)
    // the backward extension specifically:
    assert(streamed.contains((1L, Timestamp.valueOf("2024-03-01 10:06:00"),
      Timestamp.valueOf("2024-03-01 10:30:00"), 2L, 3.0)))
  }

  test("streamed == batch under randomized disorder and batch splits (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L) // fixed seed: reproducible
    for (trial <- 0 until 3) {
      // events for 3 users inside a 90-min span — all within the 2 h
      // watermark of the max, so nothing is dropped as late
      val base = Timestamp.valueOf("2024-03-01 10:00:00").getTime
      val events = (0 until 24).map { i =>
        val u = 1L + rnd.nextInt(3)
        val minute = rnd.nextInt(90)
        Event(new Timestamp(base + minute * 60000L + i), "click", u, i.toDouble)
      }
      val batch = Sessionize.sessionizeBatch(events.toDS(), 10).collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet

      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Event]
      val out = scala.collection.mutable.ArrayBuffer[Sessionize.Session]()
      val q = Sessionize.sessionizeStream(mem.toDS(), 10).writeStream
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory(s"ckpt-prop$trial").toString)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[Sessionize.Session], _: Long) =>
          out ++= ds.collect(); ()
        }
        .trigger(Trigger.ProcessingTime(0))
        .start()
      // shuffled events across a random number of micro-batches
      val shuffled = rnd.shuffle(events.toVector)
      val nSplits = 2 + rnd.nextInt(3)
      shuffled.grouped(math.max(1, shuffled.size / nSplits)).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      // flush: two far-future events advance the watermark past everything
      mem.addData(ev(99, "2024-03-02 09:00:00", 0.0))
      q.processAllAvailable()
      mem.addData(ev(99, "2024-03-02 10:00:00", 0.0))
      q.processAllAvailable()
      q.stop()
      val streamed = out.filter(_.user_id != 99)
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet
      assert(streamed == batch, s"trial $trial: streamed != batch")
    }
  }

  test("clusterPairs: components get min-id labels; dedupByPairs keeps representatives") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val df = Seq(1L, 2L, 3L, 10L, 11L, 42L).toDF("doc_id")
    val kept = Dedup.dedupByPairs(df, col("doc_id"), pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 42L))
  }

  test("clusterPairs: long chain converges within iteration cap") {
    import spark.implicits._
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(chain, maxIter = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet == Set(1L))
  }

  test("clusterPairs: pointer doubling converges a 300-link chain in <= 12 iterations") {
    import spark.implicits._
    val chain = (1L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.clusterPairs(chain).collect() // default maxIter = 12
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 300 && labels.values.toSet == Set(1L))
  }

  test("clusterPairs: throws loudly instead of returning split labels") {
    import spark.implicits._
    val chain = (1L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalStateException] {
      Dedup.clusterPairs(chain, maxIter = 2).collect()
    }
  }
}
