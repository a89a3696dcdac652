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
    * same) day, with pct = 100·n/size (two exact integers, one
    * multiply + one divide in the same literal order as the oracle,
    * then dround). Two hash aggregations + one broadcast of the
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
        gf.dround(lit(100.0) * col("n_users") / col("cohort_size"), 2)
          .as("retention_pct"))
      .orderBy(col("cohort_day"), col("activity_day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_funnel" -> q43,
    "q44_cohort_retention" -> q44)

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
        |  round(100.0 * n_users / cohort_size, 2) AS retention_pct
        |FROM m JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, activity_day""".stripMargin)
}
