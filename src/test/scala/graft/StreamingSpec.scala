package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pyramid
import graft.sources.KafkaSource
import graft.streaming.{Sinks, StreamJobs}

case class Ev(ts: Timestamp, event_type: String, user_id: Long, value: Double)

/** Structured Streaming fidelity tests (SURVEY.md §2.7): the same
  * StreamJobs transform, driven as a real stream (MemoryStream →
  * watermark → windowed agg → foreachBatch, Trigger.AvailableNow), must
  * produce exactly the batch answer — the reference's trigger-once
  * "whole topic in one micro-batch" semantics (T5/T7).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("streaming-spec")

  def mkEvents: Seq[Ev] = {
    // deterministic synthetic stream: 3 entities × 6 hours × several events
    val types = Seq("click", "view", "error")
    for {
      h <- 0 until 6
      t <- types
      i <- 0 until 4
    } yield Ev(
      Timestamp.valueOf(f"2024-03-0${1 + h / 24}%s ${h % 24}%02d:${i * 11}%02d:00"),
      t, (h * 7 + i) % 10, ((h * 13 + i * 29) % 100) / 2.0 + 1.0)
  }

  test("sq1 streamed == sq1 batch (AvailableNow drains to same result)") {
    import spark.implicits._
    val rows = mkEvents
    val batchDf = rows.toDF()
    val baselines = Pyramid.baselines(batchDf, col("event_type"), col("ts"), col("value"))
      .cache()
    val expected = StreamJobs.sq1VsBaseline(batchDf, baselines)
      .select("entity", "window_start", "n_events", "avg_value", "baseline_avg")
      .collect().toSet

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val collected = scala.collection.mutable.ArrayBuffer[Row]()
    val ckpt = Files.createTempDirectory("ckpt-sq1").toString
    Sinks.runAvailableNow(
      StreamJobs.sq1VsBaseline(mem.toDF(), baselines), ckpt)(identity) { df =>
      collected ++= df.select("entity", "window_start", "n_events",
        "avg_value", "baseline_avg").collect()
    }
    assert(collected.toSet == expected)
    assert(collected.size == expected.size) // update mode, single drain: no dupes
  }

  test("sq2 sliding agg streamed + trend analyzed in foreachBatch") {
    import spark.implicits._
    val rows = mkEvents
    val expected = StreamJobs.sq2TrendAnalyze(
        StreamJobs.slidingWindowAvg(rows.toDF()))
      .select("entity", "window_start", "avg_value", "trend")
      .collect().toSet

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val collected = scala.collection.mutable.ArrayBuffer[Row]()
    val ckpt = Files.createTempDirectory("ckpt-sq2").toString
    // rank/lag can't run incrementally (reference defers them to the
    // micro-batch, consumer2.py:98-114) — analyze inside foreachBatch.
    Sinks.runAvailableNow(
      StreamJobs.slidingWindowAvg(mem.toDF()), ckpt)(StreamJobs.sq2TrendAnalyze) { df =>
      collected ++= df.select("entity", "window_start", "avg_value", "trend").collect()
    }
    assert(collected.toSet == expected)
  }

  test("watermark does not drop data under AvailableNow single drain (T7)") {
    import spark.implicits._
    // one very late event (3 days before the rest): with a 2h watermark a
    // continuous run would drop it, but a single AvailableNow drain sees
    // all offsets in one batch — reference fidelity point.
    val rows = mkEvents :+ Ev(Timestamp.valueOf("2024-02-27 00:00:00"), "click", 1L, 5.0)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val collected = scala.collection.mutable.ArrayBuffer[Row]()
    val ckpt = Files.createTempDirectory("ckpt-late").toString
    Sinks.runAvailableNow(
      StreamJobs.hourlyWindowAvg(mem.toDF()), ckpt)(identity) { df =>
      collected ++= df.collect()
    }
    val lateWindow = collected.filter(_.getAs[Timestamp]("window_start") ==
      Timestamp.valueOf("2024-02-27 00:00:00"))
    assert(lateWindow.size == 1)
  }

  test("streamed dedup drops watermark-window duplicates (bounded state)") {
    import spark.implicits._
    val e1 = Ev(Timestamp.valueOf("2024-03-01 10:00:00"), "click", 1L, 5.0)
    val rows = Seq(e1, e1, e1, // exact duplicates (e.g. producer retries)
      Ev(Timestamp.valueOf("2024-03-01 10:30:00"), "click", 1L, 6.0),
      Ev(Timestamp.valueOf("2024-03-01 11:00:00"), "view", 2L, 7.0))
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val collected = scala.collection.mutable.ArrayBuffer[Row]()
    val ckpt = Files.createTempDirectory("ckpt-dedup").toString
    Sinks.runAvailableNow(
      StreamJobs.dedupEvents(mem.toDF(), Seq("user_id", "event_type", "ts")),
      ckpt, outputMode = "append")(identity) { df => collected ++= df.collect() }
    assert(collected.size == 3) // 5 inputs, 2 dropped duplicates
    assert(collected.map(_.getAs[Timestamp]("ts")).distinct.size == 3)
  }

  test("sq6 stream-stream interval join: streamed == batch twin (append mode)") {
    import spark.implicits._
    val rows = mkEvents
    val batch = rows.toDF()
    val expected = StreamJobs.sq6ClickErrorJoin(batch, batch)
      .select("user_id", "click_ts", "click_value", "error_ts", "error_value")
      .collect().map(_.toString).sorted.toSeq
    assert(expected.nonEmpty, "fixture must produce click→error pairs")

    implicit val sc = spark.sqlContext
    val memC = MemoryStream[Ev]
    val memE = MemoryStream[Ev]
    memC.addData(rows: _*)
    memE.addData(rows: _*)
    val collected = scala.collection.mutable.ArrayBuffer[Row]()
    val ckpt = Files.createTempDirectory("ckpt-sq6").toString
    // stream-stream inner joins are append-only: rows emit when both
    // sides' watermarks pass; AvailableNow drains everything in order
    Sinks.runAvailableNow(
      StreamJobs.sq6ClickErrorJoin(memC.toDF(), memE.toDF()), ckpt,
      outputMode = "append")(identity) { df => collected ++= df.collect() }
    val got = collected
      .map(r => Row(r.getAs[Any]("user_id"), r.getAs[Any]("click_ts"),
        r.getAs[Any]("click_value"), r.getAs[Any]("error_ts"),
        r.getAs[Any]("error_value")).toString).sorted.toSeq
    assert(got == expected)
  }

  test("sq7 left-outer stream-stream: outer nulls emit after watermark passes, across restart") {
    import spark.implicits._
    // day-1 clicks with NO matching errors; a day-3 event far enough
    // ahead that (after it arrives) the 2h watermark passes day-1+1h
    // and the unmatched clicks can finally emit with nulls
    val oldClicks = Seq(
      Ev(Timestamp.valueOf("2024-03-01 10:00:00"), "click", 1L, 5.0),
      Ev(Timestamp.valueOf("2024-03-01 11:00:00"), "click", 2L, 6.0))
    val lateDriver = Ev(Timestamp.valueOf("2024-03-03 12:00:00"), "click", 9L, 1.0)

    implicit val sc = spark.sqlContext
    val memC = MemoryStream[Ev]
    val memE = MemoryStream[Ev]
    val collected = scala.collection.mutable.ArrayBuffer[Row]()
    val ckpt = Files.createTempDirectory("ckpt-sq7").toString
    def drain(): Unit = Sinks.runAvailableNow(
      StreamJobs.sq7ClickErrorLeftOuter(memC.toDF(), memE.toDF()), ckpt,
      outputMode = "append")(identity) { df => collected ++= df.collect() }

    // run 1: only the old clicks — watermark starts at 0, outer rows
    // CANNOT emit yet (a matching error could still arrive)
    memC.addData(oldClicks: _*)
    drain()
    assert(collected.isEmpty, "outer rows must not emit before the watermark proves no match")

    // run 2 (same checkpoint): day-3 events on BOTH sides — the join
    // watermark is min(click side, error side), so the error stream
    // must advance too. Watermark moves AT BATCH END — eviction happens
    // in the NEXT batch, so still empty after this run.
    memC.addData(lateDriver)
    memE.addData(Ev(Timestamp.valueOf("2024-03-03 12:00:00"), "error", 99L, 1.0))
    drain()
    // run 3: any further batch starts with the recovered day-3−2h
    // watermark; the day-1 clicks are now provably unmatched and emit
    memC.addData(Ev(Timestamp.valueOf("2024-03-03 13:00:00"), "click", 9L, 1.0))
    memE.addData(Ev(Timestamp.valueOf("2024-03-03 13:00:00"), "error", 99L, 1.0))
    drain()
    val users = collected.map(_.getAs[Long]("user_id")).sorted
    assert(users == Seq(1L, 2L), s"expected day-1 outer rows, got $collected")
    collected.foreach(r => assert(r.isNullAt(r.fieldIndex("error_ts"))))
  }

  test("HLL registers compose with streaming windows (streamed == batch)") {
    import spark.implicits._
    import graft.operators.Hll
    // the register table is a plain windowed groupBy+max — it runs
    // unchanged on a watermarked stream (bounded state), and a drain
    // must produce the exact batch registers (max is order-insensitive)
    val rows = mkEvents
    def registers(df: org.apache.spark.sql.DataFrame) = {
      val src = StreamJobs.withEventTime(df)
        .select(window($"ts", "1 hour").getField("start").as("wnd"), $"user_id")
      Hll.registers(src, $"user_id", Seq($"wnd"))
    }
    val expected = registers(rows.toDF()).collect()
      .map(_.toString).sorted.toSeq

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(rows: _*)
    val collected = scala.collection.mutable.ArrayBuffer[Row]()
    val ckpt = Files.createTempDirectory("ckpt-hll").toString
    Sinks.runAvailableNow(registers(mem.toDF()), ckpt)(identity) { df =>
      collected ++= df.collect()
    }
    assert(collected.map(_.toString).sorted.toSeq == expected)
  }

  test("kafka-shaped json payloads parse through the shared schema (S7)") {
    import spark.implicits._
    val raw = Seq(
      ("""{"ts":"2024-03-01T10:15:00Z","event_type":"click","user_id":7,"value":3.25}""", "t1"),
      ("""not json at all""", "t1")
    ).toDF("value", "topic")
    val parsed = KafkaSource.parseJson(raw).collect()
    assert(parsed.length == 2)
    val ok = parsed.find(r => !r.isNullAt(r.fieldIndex("event_type"))).get
    assert(ok.getAs[String]("topic") == "t1")
    assert(ok.getAs[String]("event_type") == "click")
    assert(ok.getAs[Double]("value") == 3.25)
    assert(ok.getAs[Timestamp]("ts") == Timestamp.valueOf("2024-03-01 10:15:00"))
    // malformed → null-filled struct, stream keeps flowing (no exception)
    val bad = parsed.find(r => r.isNullAt(r.fieldIndex("event_type"))).get
    assert(bad.getAs[String]("topic") == "t1")
  }

  test("S5/S6: connector-shaped records (binary value, topic, partition, offset) parse + demux") {
    import org.apache.spark.sql.Row
    // frames exactly as spark-sql-kafka delivers them
    val rows = Seq(
      Row("k1".getBytes, """{"ts":"2024-03-01T10:00:00Z","event_type":"click","user_id":1,"value":2.5}""".getBytes,
        "clicks", 0, 100L, Timestamp.valueOf("2024-03-01 10:00:01"), 0),
      Row(null, """{"ts":"2024-03-01T10:05:00Z","event_type":"error","user_id":2,"value":0.0}""".getBytes,
        "errors", 3, 7L, Timestamp.valueOf("2024-03-01 10:05:01"), 0))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaSource.kafkaRecordSchema)
    val parsed = KafkaSource.parseJson(raw).collect()
    assert(parsed.length == 2)
    val byTopic = parsed.map(r => r.getAs[String]("topic") -> r).toMap
    assert(byTopic("clicks").getAs[String]("event_type") == "click")
    assert(byTopic("clicks").getAs[Double]("value") == 2.5)
    assert(byTopic("errors").getAs[Long]("user_id") == 2L) // null key is fine
    // demux on the topic column — the consumer4-style split
    val demux = KafkaSource.parseJson(raw)
    assert(demux.filter(col("topic") === "clicks").count() == 1)
    assert(demux.filter(col("topic") === "errors").count() == 1)
  }

  private def connectorRows(offsets: Seq[Long], topic: String = "clicks",
                            partition: Int = 0): Seq[org.apache.spark.sql.Row] =
    offsets.map { o =>
      org.apache.spark.sql.Row(null,
        s"""{"ts":"2024-03-01T10:00:00Z","event_type":"click","user_id":$o,"value":1.0}""".getBytes,
        topic, partition, o, Timestamp.valueOf("2024-03-01 10:00:01"), 0)
    }

  test("S5: maxOffsetsPerTrigger emulation rate-limits each micro-batch") {
    val srcDir = Files.createTempDirectory("replay-src").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(connectorRows(0L until 25L)),
        KafkaSource.kafkaRecordSchema)
      .write.mode("overwrite").parquet(srcDir)
    val batches = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q = KafkaSource.replayStream(spark, srcDir,
        maxOffsetsPerTrigger = Some(10L)).writeStream
      .option("checkpointLocation", Files.createTempDirectory("replay-ck").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches += df.select("offset").collect().map(_.getLong(0)).toSeq; ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nonEmpty = batches.filter(_.nonEmpty)
    assert(nonEmpty.size == 3, s"expected ceil(25/10)=3 batches: $nonEmpty")
    assert(nonEmpty.forall(_.size <= 10), "a micro-batch exceeded the offset cap")
    assert(nonEmpty.flatten.sorted == (0L until 25L)) // nothing lost or duplicated
  }

  test("S5: failOnDataLoss=true throws naming the offset gap; false proceeds") {
    val srcDir = Files.createTempDirectory("replay-gap").toString
    // offsets 0..9 and 15..19: records 10..14 aged out — a data-loss gap
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          connectorRows((0L until 10L) ++ (15L until 20L), partition = 2)),
        KafkaSource.kafkaRecordSchema)
      .write.mode("overwrite").parquet(srcDir)
    val ex = intercept[IllegalStateException] {
      KafkaSource.replayStream(spark, srcDir, failOnDataLoss = true)
    }
    assert(ex.getMessage.contains("clicks") && ex.getMessage.contains("partition=2"))
    // log-and-continue mode: the surviving 15 records all arrive
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    val q = KafkaSource.replayStream(spark, srcDir, failOnDataLoss = false)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("replay-ck2").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        out ++= df.select("offset").collect().map(_.getLong(0)); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(out.sorted.toSeq == ((0L until 10L) ++ (15L until 20L)))
  }

  /** T6: the contract Kafka-source wiring would rely on (offsets +
    * commit log in the checkpoint; a committed batch is never
    * re-delivered, an uncommitted one is): crash AFTER batch 0 commits
    * and DURING batch 1, restart from the same checkpoint, and assert
    * exactly-once delivery of every source row. Uses the file source so
    * the checkpoint (not driver memory) carries all progress across
    * the restart — the same recovery path as `startingOffsets`/
    * checkpoint recovery on a real broker (ASVSP
    * `consumer1.py:106-113`).
    */
  test("checkpoint restart: crash mid-stream resumes exactly-once (T6)") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("ckpt-src").toString
    val ckpt = Files.createTempDirectory("ckpt-restart").toString
    val fileA = mkEvents.take(10)
    val fileB = mkEvents.slice(10, 20)
    fileA.toDF().coalesce(1).write.mode("append").parquet(srcDir)
    fileB.toDF().coalesce(1).write.mode("append").parquet(srcDir)

    def stream = spark.readStream
      .schema(fileA.toDF().schema)
      .option("maxFilesPerTrigger", "1") // force 2 batches
      .parquet(srcDir)
    val out = scala.collection.mutable.ArrayBuffer[Row]()

    // run 1: commit batch 0, crash inside batch 1 (before its commit)
    val q1 = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, id: Long) =>
        if (id == 0) { out ++= df.collect(); () }
        else throw new RuntimeException("injected crash in batch 1")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(out.size == 10) // exactly batch 0

    // run 2: same checkpoint — batch 0 must NOT re-deliver, batch 1 must
    val q2 = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) => out ++= df.collect(); () }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    val expected = (fileA ++ fileB).map(e => (e.ts, e.event_type, e.user_id, e.value))
    val got = out.map(r => (r.getAs[Timestamp]("ts"), r.getAs[String]("event_type"),
      r.getAs[Long]("user_id"), r.getAs[Double]("value")))
    assert(got.size == expected.size, s"expected exactly-once: ${got.size} rows")
    assert(got.sortBy(_.toString) == expected.sortBy(_.toString))
  }

  test("transformWithState ordinals: in-batch sort + counter persists across batches") {
    import spark.implicits._
    import graft.streaming.OrdinalStream
    implicit val sc = spark.sqlContext
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    val mem = MemoryStream[Ev]
    val events = mem.toDS()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[graft.model.Schemas.Event]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-tws").toString
    val beforeProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try OrdinalStream.ordinals(events).writeStream
        .format("memory").queryName("tws_ordinals")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      finally spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        beforeProvider)
    // batch 1: user 1 arrives out of event-time order; user 2 once
    mem.addData(Ev(ts(2), "b", 1L, 0.0), Ev(ts(1), "a", 1L, 0.0),
      Ev(ts(5), "x", 2L, 0.0))
    q.processAllAvailable()
    // batch 2: the ValueState counter must continue, not restart
    mem.addData(Ev(ts(3), "c", 1L, 0.0))
    q.processAllAvailable()
    q.stop()
    val byUser = spark.table("tws_ordinals").as[OrdinalStream.SeqEvent]
      .collect().groupBy(_.user_id)
    assert(byUser(1L).sortBy(_.seq).map(e => (e.seq, e.event_type)).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(byUser(2L).map(_.seq).toSeq == Seq(1L))
  }

  test("transformWithState initial state: seeded counters continue, unseeded start at 1") {
    import spark.implicits._
    import graft.streaming.OrdinalStream
    implicit val sc = spark.sqlContext
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    val mem = MemoryStream[Ev]
    val events = mem.toDS()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[graft.model.Schemas.Event]
    // user 1 migrated mid-history: 100 ordinals already assigned by the
    // batch pipeline; user 2 is brand new
    val seeds = Seq((1L, 100L)).toDS()
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-tws-seed").toString
    val beforeProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try OrdinalStream.seededOrdinals(events, seeds).writeStream
        .format("memory").queryName("tws_seeded")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      finally spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        beforeProvider)
    mem.addData(Ev(ts(2), "b", 1L, 0.0), Ev(ts(1), "a", 1L, 0.0),
      Ev(ts(5), "x", 2L, 0.0))
    q.processAllAvailable()
    // the seeded counter must also persist across batches
    mem.addData(Ev(ts(3), "c", 1L, 0.0))
    q.processAllAvailable()
    q.stop()
    val byUser = spark.table("tws_seeded").as[OrdinalStream.SeqEvent]
      .collect().groupBy(_.user_id)
    assert(byUser(1L).sortBy(_.seq).map(e => (e.seq, e.event_type)).toSeq ==
      Seq((101L, "a"), (102L, "b"), (103L, "c")))
    assert(byUser(2L).map(_.seq).toSeq == Seq(1L))
  }

  test("transformWithState MapState/ListState: per-entry counts accumulate, recent ring trims") {
    import spark.implicits._
    import graft.streaming.ProfileStream
    implicit val sc = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val mem = MemoryStream[Ev]
    val events = mem.toDS()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[graft.model.Schemas.Event]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-tws-map").toString
    val beforeProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try ProfileStream.profiles(events).writeStream
        .format("memory").queryName("tws_profiles")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      finally spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        beforeProvider)
    // batch 1: user 1 gets 2 clicks + 1 view
    mem.addData(Ev(ts(0), "click", 1L, 0.0), Ev(ts(1), "click", 1L, 0.0),
      Ev(ts(2), "view", 1L, 0.0))
    q.processAllAvailable()
    // batch 2: 2 more views + 4 scrolls — scroll takes the lead and
    // the 9 cumulative events overflow the 5-slot recent ring
    mem.addData(Ev(ts(3), "view", 1L, 0.0), Ev(ts(4), "view", 1L, 0.0),
      Ev(ts(5), "scroll", 1L, 0.0), Ev(ts(6), "scroll", 1L, 0.0),
      Ev(ts(7), "scroll", 1L, 0.0), Ev(ts(8), "scroll", 1L, 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tws_profiles").as[ProfileStream.UserProfile]
      .collect().sortBy(_.total_events)
    assert(rows.length == 2)
    val b1 = rows.head
    assert(b1.total_events == 3 && b1.n_types == 2 &&
      b1.top_type == "click" && b1.top_count == 2 && b1.recent_n == 3)
    val b2 = rows.last
    assert(b2.total_events == 9 && b2.n_types == 3)
    // scroll now dominates with 4
    assert(b2.top_type == "scroll" && b2.top_count == 4)
    // ring keeps only the latest 5 events: 10:04..10:08 → span 4 min
    assert(b2.recent_n == 5 && b2.recent_span_us == 4L * 60 * 1000000)
  }

  test("transformWithState event-time timers: inactivity finalizes exactly the idle user") {
    import spark.implicits._
    import graft.streaming.OrdinalStream
    implicit val sc = spark.sqlContext
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    val mem = MemoryStream[Ev]
    val events = mem.toDS()
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .withWatermark("ts", "1 hour")
      .as[graft.model.Schemas.Event]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-tws-timer").toString
    val beforeProvider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q =
      try OrdinalStream.inactivitySummaries(events, 15 * 60 * 1000L).writeStream
        .format("memory").queryName("tws_inactivity")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      finally spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        beforeProvider)
    // batch 1: user 1 active 10:00–10:05 → timer armed at 10:20
    mem.addData(Ev(t(10, 0), "a", 1L, 0.0), Ev(t(10, 5), "b", 1L, 0.0))
    q.processAllAvailable()
    // batch 2: user 2 at 12:00 → watermark will advance to 11:00,
    // past user 1's 10:20 timer but far short of user 2's 12:15
    mem.addData(Ev(t(12, 0), "x", 2L, 0.0))
    q.processAllAvailable()
    // one more batch so the advanced watermark is applied to timers
    // even if no-data batches are disabled
    mem.addData(Ev(t(12, 1), "x", 2L, 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("tws_inactivity").as[OrdinalStream.UserSummary].collect()
    assert(got.length == 1, s"exactly the idle user finalizes: ${got.toSeq}")
    val s = got.head
    assert(s.user_id == 1L && s.n_events == 2L)
    assert(s.first_us == t(10, 0).getTime * 1000L)
    assert(s.last_us == t(10, 5).getTime * 1000L)
  }

  test("q56: staggered replay merges sessions ACROSS micro-batches, batch-equal") {
    import graft.queries.StreamingQueries
    import graft.sources.Tables
    val G = 1800L * 1000000L // 30-min session gap, micros
    // the final witness assertion is vacuously false with no testdata —
    // skip (not fail) on hosts without it
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory ||
      new java.io.File("/root/testdata/sf0.01").isDirectory)
    var witness = false
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      val res = StreamingQueries.q56(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(StreamingQueries.q56Batches >= 4,
        s"$dir: expected >= 4 micro-batches, got ${StreamingQueries.q56Batches}")
      // the staggered drain must equal the one-shot batch session_window
      val ev = Tables.load(spark, dir, "events")
      val batch = ev
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(unix_timestamp(min(col("ts"))).as("session_start"),
          unix_timestamp(max(col("ts"))).as("session_end"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(res == batch, s"$dir: staggered stream diverged from batch")
      // merge WITNESS against the cuts the run actually used: a user
      // with a last pre-slice event `a` and a first post-slice event
      // `c` at >= 30-min separation, bridged (< 30 min each side) by a
      // DEFERRED event `b`, necessarily sat in state as TWO sessions
      // after the earlier batch and merged when b arrived a batch later.
      val cuts = Seq(StreamingQueries.q56Cuts._1, StreamingQueries.q56Cuts._2)
      assert(cuts.forall(_ > 0), "q56 did not record its replay cuts")
      val byUser = ev.select(col("user_id"), expr("unix_micros(ts)").as("u"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
      for (cutU <- cuts; (_, ts) <- byUser if !witness) {
        val defLo = cutU - 2400000000L
        val defHi = cutU - 1200000000L
        val aOpt = ts.filter(_ <= defLo).lastOption
        val cOpt = ts.find(t => t > defHi && t < cutU)
        (aOpt, cOpt) match {
          case (Some(a), Some(c)) if c - a >= G =>
            witness = witness || ts.exists(b => b > defLo && b <= defHi &&
              b - a < G && c - b < G)
          case _ =>
        }
      }
    }
    assert(witness,
      "no cross-batch merge witness at any tested sf — the staggered replay is vacuous")
  }

  test("q69: streaming KMV sketch equals batch q68 for closed windows") {
    import graft.queries.SketchQueries
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val dir = "/root/testdata/sf0.001"
    val batch = SketchQueries.q68(spark, dir).collect().map(_.toSeq).toSet
    val stream = SketchQueries.q69(spark, dir).collect().map(_.toSeq).toSet
    // the sentinel closes every real day, so the streamed emissions must
    // cover q68's full output — row-for-row, estimate bits included
    assert(stream == batch,
      s"stream/batch divergence: only-batch=${(batch -- stream).take(3)} " +
        s"only-stream=${(stream -- batch).take(3)}")
    // the replay is split on the median day + sentinel, drained one file
    // per trigger — emissions genuinely span multiple micro-batches
    assert(SketchQueries.q69Batches >= 3,
      s"expected >= 3 micro-batches, got ${SketchQueries.q69Batches}")
  }
}
