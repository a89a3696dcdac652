package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-day KMV accumulator for [[SketchStream.KmvWindowProcessor]]:
  * order count + the ≤ k smallest distinct customer hashes. TOP-LEVEL
  * public case class with multi-character fields — the generated state
  * encoder Janino-compiles against this class, and a restricted-
  * visibility nested case class makes that compilation fail and fall
  * back to interpreted projection per map entry (the
  * [[InactivityAcc]] lesson).
  */
case class DayAgg(nOrders: Long, sketch: Array[Long])

/** STREAMING KMV windowed-distinct sketches (`transformWithState`) —
  * the live counterpart of the batch q68: per key (order priority), a
  * bounded bottom-k sketch of the distinct-customer hashes accumulates
  * per DAY in a [[MapState]], and when the event-time watermark passes
  * a day's end an event-time TIMER emits that day's trailing-window
  * estimate by merging the ≤ `windowDays`+1 day sketches in state.
  *
  * Scale shape (the q68 economics, kept live): state per key is
  * bounded by (window + watermark lag) days × k longs — each day
  * carries ≤ k = 256 hashes no matter how many customers it saw, and
  * days that can never appear in a future window are evicted. KMV
  * insertion (keep the k smallest distinct hashes seen so far) is
  * order-independent, so arrival order and micro-batch boundaries
  * cannot change any emitted row — the stream is hash-identical to the
  * batch query, which is exactly what the q69 driver row proves.
  *
  * Eviction is ORDER-INDEPENDENT of timer-callback sequencing: it runs
  * only in the input phase (which precedes every timer callback of a
  * batch) against the emission frontier of PRIOR batches, and a day is
  * dropped only when it trails that frontier by more than the window —
  * every day ≤ the frontier has provably already emitted (its timer
  * expired no later than the frontier's), and same-batch callbacks all
  * see the untouched map.
  */
object SketchStream {

  /** One order arrival: `day` = datediff(order date, 1992-01-01) and
    * `ts` is the order date at midnight UTC (the watermark column —
    * dates carry no sub-ms part, so ms precision is exact here).
    */
  case class OrderArrival(prio: String, day: Int, ts: java.sql.Timestamp,
                          cust: Long)

  /** Raw per-day emission: merged-sketch size, the k-th smallest
    * merged hash (0 when the merge holds < k — the estimator's exact
    * branch never reads it), and the window's order count. The
    * estimate itself is computed batch-side with [[graft.operators
    * .Kmv.estimate]] so stream and batch share one IEEE chain.
    */
  case class KmvWindowEmit(prio: String, day: Int, n_orders_90d: Long,
                           mg_size: Long, uh_k: Long)

  /** Epoch day of 1992-01-01, the `day` index origin (22 years of
    * 365 days + 5 leap days over 1972/76/80/84/88).
    */
  private val EpochDay1992 = 8035L
  private val DayMs = 86400000L
  private def dayEndMs(day: Int): Long = (EpochDay1992 + day + 1L) * DayMs

  class KmvWindowProcessor(k: Int, windowDays: Int)
      extends StatefulProcessor[String, OrderArrival, KmvWindowEmit] {
    @transient private var days: MapState[Int, DayAgg] = _
    @transient private var emittedThrough: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      days = getHandle.getMapState[Int, DayAgg]("days",
        Encoders.scalaInt, Encoders.product[DayAgg], TTLConfig.NONE)
      emittedThrough = getHandle.getValueState[Int]("emittedThrough",
        Encoders.scalaInt, TTLConfig.NONE)
    }

    private def frontier: Int =
      if (emittedThrough.exists()) emittedThrough.get() else Int.MinValue

    override def handleInputRows(key: String, rows: Iterator[OrderArrival],
                                 tv: TimerValues): Iterator[KmvWindowEmit] = {
      val done = frontier // prior batches only: input precedes timers
      rows.toVector.groupBy(_.day).foreach { case (day, evs) =>
        if (day > done) { // watermark contract: a finalized day is immutable
          val prev = if (days.containsKey(day)) Option(days.getValue(day)) else None
          if (prev.isEmpty) getHandle.registerTimer(dayEndMs(day))
          val hashes = evs.map(e =>
            graft.functions.NativeExprs.mix64(e.cust) ^ Long.MinValue)
          val sk = (prev.map(_.sketch.toVector).getOrElse(Vector.empty) ++ hashes)
            .distinct.sorted.take(k).toArray
          days.updateValue(day, DayAgg(prev.map(_.nOrders).getOrElse(0L) + evs.size, sk))
        }
      }
      // bounded state: a day trailing the emission frontier by more
      // than the window can never appear in a future window (Long math:
      // the pristine frontier is Int.MinValue and must not wrap)
      days.keys().toVector.filter(_.toLong <= done.toLong - windowDays)
        .foreach(days.removeKey)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[KmvWindowEmit] = {
      val day = (info.getExpiryTimeInMs() / DayMs - EpochDay1992 - 1L).toInt
      if (!days.containsKey(day)) Iterator.empty
      else {
        // POINT-read exactly the window's ≤ windowDays+1 day entries —
        // never iterate the whole map: pending-day count can far exceed
        // the window (a watermark jump expires thousands of timers in
        // one batch, and map iteration per callback would be quadratic
        // in it; RocksDB point gets keep each emission O(window · k))
        val window = (day - windowDays to day).flatMap { d =>
          if (days.containsKey(d)) Some(days.getValue(d)) else None
        }
        // primitive-array merge: only the distinct-hash COUNT and the
        // k-th smallest are needed — one unboxed sort + one dedup pass
        // over ≤ (windowDays+1)·k longs, no per-element boxing
        val merged = new Array[Long](window.iterator.map(_.sketch.length).sum)
        var off = 0
        window.foreach { w =>
          System.arraycopy(w.sketch, 0, merged, off, w.sketch.length)
          off += w.sketch.length
        }
        java.util.Arrays.sort(merged)
        var mgSize = 0L
        var uhK = 0L
        var i = 0
        while (i < merged.length) {
          if (i == 0 || merged(i) != merged(i - 1)) {
            mgSize += 1
            if (mgSize == k) uhK = merged(i)
          }
          i += 1
        }
        if (day > frontier) emittedThrough.update(day)
        Iterator.single(KmvWindowEmit(key, day, window.iterator.map(_.nOrders).sum,
          mgSize, if (mgSize >= k) uhK else 0L))
      }
    }
  }

  /** Live trailing-window distinct estimates. Callers must set a
    * watermark on `ts` upstream — timers fire as it passes day ends.
    */
  def windowedDistinct(orders: Dataset[OrderArrival], k: Int,
                       windowDays: Int): Dataset[KmvWindowEmit] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_.prio)
      .transformWithState(new KmvWindowProcessor(k, windowDays),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
