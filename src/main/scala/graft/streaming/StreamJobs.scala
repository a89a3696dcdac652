package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.gf

/** The five streaming analytics jobs, generalized from the reference's
  * consumers (ASVSP `consumer1..5.py`) to any event stream with
  * `(ts timestamp, event_type string, user_id long, value double)`.
  *
  * Design carried over from the reference (SURVEY.md §3.3): stateful
  * windowed aggregation runs IN the stream (watermark + tumbling/sliding
  * window, incremental state); analytical post-processing that Structured
  * Streaming can't do incrementally (rank/lag over windows) runs in the
  * micro-batch via `foreachBatch` — here factored as a separate
  * `*Analyze` batch stage so it is unit-testable and reusable.
  *
  * Every transform is a pure `DataFrame => DataFrame` that accepts BOTH a
  * streaming and a batch frame: on a batch frame the same code produces
  * the reference answer for the whole topic (= what trigger-once computed
  * in one micro-batch), which is how the DuckDB oracle checks it. The
  * watermark (T1) is applied only when the input actually streams.
  *
  * Scale: windowed aggregation state is O(active windows × entities);
  * with a 2 h watermark and 1 h windows that's ~3 windows of keys held in
  * the state store per entity — constant memory at any throughput. The
  * stream-static join side (baselines) is a broadcast: thousands of rows
  * at most, refreshed per run like the reference's cached Hive table
  * (`consumer1.py:50-62`).
  */
object StreamJobs {

  private def cents(c: Column) = gf.fixed(c, 100.0)

  /** T1: 2-hour event-time watermark (ASVSP `consumer1.py:47`), applied
    * only when streaming — on batch input it would be a no-op anyway.
    */
  def withEventTime(events: DataFrame): DataFrame =
    if (events.isStreaming) events.withWatermark("ts", "2 hours") else events

  /** A9/T2: tumbling 1-hour window average per entity, with the calendar
    * keys (hour / month / weekend) the baseline join needs. Mirrors
    * `consumer1.py:64-71`.
    */
  def hourlyWindowAvg(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts"), "1 hour"), col("event_type").as("entity"))
      .agg(sum(cents(col("value"))).as("s_f"), count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("entity"), col("s_f"), col("n_events"))
      .withColumn("avg_value", gf.meanFromFixed(col("s_f"), col("n_events"), 100.0))
      .drop("s_f")
      .withColumn("hour", hour(col("window_start")))
      .withColumn("month", month(col("window_start")))
      .withColumn("is_weekend", dayofweek(to_date(col("window_start"))).isin(1, 7))

  /** SQ1 (J4): windowed average vs historical baseline — stream-static
    * left join on the 4-key (entity, month, hour, weekend), pct-of-
    * baseline with reference null propagation. Mirrors `consumer1.py:73-88`.
    */
  def sq1VsBaseline(events: DataFrame, baselines: DataFrame): DataFrame = {
    val agg = hourlyWindowAvg(events)
    agg.join(broadcast(baselines),
        Seq("entity", "month", "hour", "is_weekend"), "left")
      .withColumn("pct_of_baseline",
        col("avg_value") / col("baseline_avg") * 100)
  }

  /** A10/T3: sliding 3-hour window (1-hour slide) average per entity.
    * Mirrors `consumer2.py:50-72`.
    */
  def slidingWindowAvg(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts"), "3 hours", "1 hour"), col("event_type").as("entity"))
      .agg(sum(cents(col("value"))).as("s_f"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("entity"),
        gf.meanFromFixed(col("s_f"), col("n_events"), 100.0).as("avg_value"),
        col("n_events"))

  /** SQ2 batch stage (W15): trend classification against the previous
    * sliding window, ±10% thresholds, NULL-lag → 'stable'. Runs in
    * `foreachBatch` on the streaming path. Mirrors `consumer2.py:98-114`.
    */
  def sq2TrendAnalyze(sliding: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("entity")).orderBy(col("window_start"))
    sliding
      .withColumn("prev_avg", lag(col("avg_value"), 1).over(w))
      .withColumn("trend",
        when(col("prev_avg").isNull, "stable")
          .when(col("avg_value") > col("prev_avg") * 1.1, "rising")
          .when(col("avg_value") < col("prev_avg") * 0.9, "falling")
          .otherwise("stable"))
  }

  /** SQ3 (W13 in-batch): per-window top-k users by average value via
    * dense_rank. Mirrors `consumer3.py:53-72`.
    */
  def sq3TopUsers(events: DataFrame, k: Int = 5): DataFrame = {
    val agg = withEventTime(events)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum(cents(col("value"))).as("s_f"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("user_id"),
        gf.meanFromFixed(col("s_f"), col("n_events"), 100.0).as("avg_value"),
        col("n_events"))
    agg.withColumn("rnk",
        dense_rank().over(Window.partitionBy(col("window_start"))
          .orderBy(col("avg_value").desc, col("user_id"))))
      .filter(col("rnk") <= k)
  }

  /** SQ4 (S6/J6/P21/P22): demultiplex two logical streams out of one
    * source by event type, window-aggregate each, join on the window, and
    * classify. Mirrors `consumer4.py`'s AQ⋈WX per-micro-batch join, with
    * its score formula shape (`consumer4.py:148-160`).
    */
  def sq4DemuxJoin(events: DataFrame,
                   activityTypes: Seq[String] = Seq("click", "view"),
                   signalType: String = "error"): DataFrame = {
    def winAgg(df: DataFrame, avgName: String, nName: String) =
      withEventTime(df)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(sum(cents(col("value"))).as("s_f"), count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"),
          gf.meanFromFixed(col("s_f"), col("n"), 100.0).as(avgName),
          col("n").as(nName))
    val act = winAgg(events.filter(col("event_type").isin(activityTypes: _*)),
      "activity_avg", "n_activity")
    val sig = winAgg(events.filter(col("event_type") === signalType),
      "signal_avg", "n_signal")
    act.join(sig, Seq("window_start"), "inner")
      .withColumn("score",
        col("activity_avg") * (lit(1.0) + col("n_signal") / lit(100.0)))
      .withColumn("above_signal", col("activity_avg") > col("signal_avg"))
      .withColumn("status",
        when(col("score") > 30.0 && col("above_signal"), "surging")
          .when(col("score") > 30.0, "active")
          .when(col("score") < 15.0 && !col("above_signal"), "quiet_low")
          .when(col("score") < 15.0, "quiet")
          .otherwise("neutral"))
  }

  /** In-flight stream deduplication: drop repeated events by key within
    * the watermark horizon (`dropDuplicatesWithinWatermark` keeps state
    * only until the watermark passes — bounded memory, unlike plain
    * `dropDuplicates` on a stream which keeps ALL keys forever). On a
    * batch frame it degrades to exact dedup on the keys. The streaming
    * entry point of the corpus-dedup story (exact-first, sketches
    * downstream).
    */
  def dedupEvents(events: DataFrame, keys: Seq[String]): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** SQ5 (W14/P19): current per-window entity ranking vs the historical
    * ranking derived from baselines; rank-gap anomaly flag. Mirrors
    * `consumer5.py:63-95`.
    */
  def sq5RankAnomaly(events: DataFrame, baselines: DataFrame,
                     gapThreshold: Int = 2): DataFrame = {
    val hist = baselines.withColumn("hist_rank",
      dense_rank().over(Window.partitionBy(col("month"), col("hour"), col("is_weekend"))
        .orderBy(col("baseline_avg").desc, col("entity"))))
      .select(col("entity"), col("month"), col("hour"), col("is_weekend"),
        col("hist_rank"))
    val cur = hourlyWindowAvg(events)
      .withColumn("current_rank",
        dense_rank().over(Window.partitionBy(col("window_start"))
          .orderBy(col("avg_value").desc, col("entity"))))
    cur.join(broadcast(hist), Seq("entity", "month", "hour", "is_weekend"), "left")
      .withColumn("rank_gap", abs(col("current_rank") - col("hist_rank")))
      .withColumn("is_anomaly", col("rank_gap") > gapThreshold)
  }

  /** SQ6 — stream-STREAM inner join (beyond the reference's stream-
    * static joins, completing the join surface): each click joined to
    * every error by the same user within the following hour. Both
    * sides carry event-time watermarks and the join condition bounds
    * the time skew — Structured Streaming's requirements for evicting
    * join state, so buffered state is O(events per watermark horizon),
    * not unbounded. Append-mode only (rows emit once both watermarks
    * pass). On batch frames the same code is the plain theta join, which
    * is how StreamingSpec's batch twin checks the streamed result.
    */
  def sq6ClickErrorJoin(clicks: DataFrame, errors: DataFrame): DataFrame =
    clickErrorJoin(clicks, errors, "inner")

  /** SQ7 — the LEFT OUTER stream-stream variant: clicks with no error
    * within the hour emit with nulls, but only once the error-side
    * WATERMARK has passed the join window (Structured Streaming can't
    * rule out a match before then) — which also means the null rows
    * survive a checkpoint restart: a later run emits the outer rows its
    * predecessor couldn't yet prove. StreamingSpec drives exactly that
    * two-run recovery.
    */
  def sq7ClickErrorLeftOuter(clicks: DataFrame, errors: DataFrame): DataFrame =
    clickErrorJoin(clicks, errors, "left_outer")

  private def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
                             joinType: String): DataFrame = {
    val c = withEventTime(clicks.filter(col("event_type") === "click"))
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val e = withEventTime(errors.filter(col("event_type") === "error"))
      .select(col("user_id").as("e_user"), col("ts").as("error_ts"),
        col("value").as("error_value"))
    c.join(e,
      col("user_id") === col("e_user") &&
        col("error_ts") >= col("click_ts") &&
        col("error_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
      .drop("e_user")
  }
}
