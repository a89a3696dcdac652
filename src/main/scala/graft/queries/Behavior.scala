package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.Funnel
import graft.sources.Tables

/** Behavioral-analytics queries over the events log: conversion
  * funnels and cohort retention — the product-analytics pair every
  * event-warehouse engine ships. Both are built from filtered
  * min-aggregates and hash joins (no log-wide windows), and both carry
  * exact DuckDB oracle twins.
  */
object Behavior {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  /** q43 — strictly-sequential conversion funnel signup → view →
    * click → purchase via [[graft.operators.Funnel]]: per user, the
    * earliest time of each stage occurring strictly after the previous
    * stage's chosen time, nulls after abandonment. Times output as
    * exact epoch micros (the q41 convention — no second-rounding skew).
    */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val f = Funnel.stages(events(spark, dir), "user_id", "ts", "event_type",
      Seq("signup", "view", "click", "purchase"))
    f.select(col("user_id"),
        unix_micros(col("signup_ts")).as("signup_us"),
        unix_micros(col("view_ts")).as("view_us"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"))
      .orderBy(col("user_id"))
  }

  /** q44 — daily cohort retention: cohort = calendar day of a user's
    * FIRST event, activity = distinct (user, day) pairs, and the
    * retention matrix counts cohort members active on each later (or
    * same) day, with pct = double(100·n)/size — the integer multiply
    * happens FIRST (exact in int64), then ONE double cast and ONE
    * divide, so both engines perform the identical single rounding
    * step (the oracle writes CAST(100*n AS DOUBLE)/size rather than a
    * 100.0 literal, which DuckDB would type DECIMAL and associate
    * differently), then dround. Two hash aggregations + one broadcast of the
    * |days|-row cohort-size table — the whole matrix is
    * O(days²) rows regardless of event volume.
    */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val cohorts = ev.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    val act = ev.select(col("user_id"), to_date(col("ts")).as("activity_day"))
      .distinct()
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    cohorts.join(act, Seq("user_id"))
      .groupBy(col("cohort_day"), col("activity_day"))
      .agg(count(lit(1)).as("n_users"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("activity_day"), col("n_users"),
        col("cohort_size"),
        gf.dround((lit(100L) * col("n_users")).cast("double")
            / col("cohort_size"), 2)
          .as("retention_pct"))
      .orderBy(col("cohort_day"), col("activity_day"))
  }

  /** q47 — rolling z-score anomaly detection with an ALL-INTEGER
    * decision rule: per event type, each value is flagged against the
    * mean/stddev of the 24 PRECEDING events (exclusive window — the
    * point must not pollute its own baseline). The |z| > 2 test is
    * algebraically cleared of divisions and square roots:
    *
    *   (x−μ)² > 4σ²  ⇔  (n·x − S)²·(n−1) > 4·n·(n·Q − S²)
    *
    * with S = Σx, Q = Σx² over the window, all in exact cent units —
    * so the flag is a pure int64 comparison, bit-stable on any engine
    * (max magnitudes ≈ 2^48, derived in-line). Only full windows are
    * scored; only anomalies are emitted. One sort-shuffle on the
    * partition key, the window is a 24-row frame — linear at scale.
    */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-24, -1)
    events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
        gf.fixed(col("value"), 100.0).as("vc"))
      .withColumn("n", count(col("vc")).over(w))
      .withColumn("s", sum(col("vc")).over(w))
      .withColumn("q", sum(col("vc") * col("vc")).over(w))
      .filter(col("n") === 24)
      .withColumn("d", col("n") * col("vc") - col("s"))
      .filter(col("d") * col("d") * (col("n") - 1) >
        lit(4L) * col("n") * (col("n") * col("q") - col("s") * col("s")))
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("vc"))
      .orderBy(col("event_type"), col("ts_us"), col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_funnel" -> q43,
    "q44_cohort_retention" -> q44,
    "q47_zscore_anomaly" -> q47)

  val oracles: Map[String, String] = Map(
    "q43_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'view' GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s4 AS (
        |  SELECT e.user_id, min(e.ts) AS t4 FROM events e
        |  JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t3
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT s1.user_id,
        |  epoch_us(t1) AS signup_us,
        |  epoch_us(t2) AS view_us,
        |  epoch_us(t3) AS click_us,
        |  epoch_us(t4) AS purchase_us
        |FROM s1
        |LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |LEFT JOIN s4 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q44_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day
        |  FROM events),
        |sz AS (
        |  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM f GROUP BY 1),
        |m AS (
        |  SELECT cohort_day, activity_day, CAST(count(*) AS BIGINT) AS n_users
        |  FROM f JOIN a USING (user_id) GROUP BY 1, 2)
        |SELECT m.cohort_day, m.activity_day, n_users, cohort_size,
        |  round(CAST(100 * n_users AS DOUBLE) / cohort_size, 2)
        |    AS retention_pct
        |FROM m JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, activity_day""".stripMargin,
    "q47_zscore_anomaly" ->
      """WITH v AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
        |  FROM events),
        |w AS (
        |  SELECT event_type, ts, event_id, vc,
        |    CAST(count(vc) OVER win AS BIGINT) AS n,
        |    CAST(sum(vc) OVER win AS BIGINT) AS s,
        |    CAST(sum(vc * vc) OVER win AS BIGINT) AS q
        |  FROM v
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, epoch_us(ts) AS ts_us, event_id, vc
        |FROM w
        |WHERE n = 24
        |  AND (n * vc - s) * (n * vc - s) * (n - 1) > 4 * n * (n * q - s * s)
        |ORDER BY event_type, ts_us, event_id""".stripMargin)
}
