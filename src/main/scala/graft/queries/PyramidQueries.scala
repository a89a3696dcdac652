package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Pyramid
import graft.functions.gf
import graft.sources.Tables

/** Queries instantiating the [[graft.operators.Pyramid]] transforms on the
  * testdata tables, with DuckDB oracles.
  *
  * Mapping: `events(event_type, ts, value)` plays the hourly measurement
  * table for daily stats and hour-of-day baselines (it spans one month);
  * `orders(o_orderpriority, o_orderdate, o_totalprice)` plays it for the
  * monthly/annual rollups (it spans 1995–2001, so LAG/YoY/cumulative
  * windows have real history).
  *
  * DuckDB dialect notes baked into the oracles:
  *   - DuckDB `dayofweek` is Sunday=0 (Spark is Sunday=1) → `+1`;
  *   - DuckDB `year`/`month`/`hour`/`dayofweek` return BIGINT → cast INT;
  *   - DuckDB `sum(INTEGER)` returns HUGEINT → cast BIGINT;
  *   - dates output as strings on both sides to dodge date-encoding drift.
  */
object PyramidQueries {

  /** Per-priority exceedance thresholds (P7 analog of the NAAQS map at
    * ASVSP `monthly_aggregation.py:21-30`). Chosen near the p80 of the
    * daily average so exceedance counts are non-trivial.
    */
  val orderThresholds: Seq[(String, Double)] = Seq(
    "1-URGENT" -> 360000.0,
    "2-HIGH" -> 350000.0,
    "3-MEDIUM" -> 340000.0,
    "4-NOT SPECIFIED" -> 330000.0,
    "5-LOW" -> 320000.0)

  private def thresholdSqlChain: String =
    "CASE " + orderThresholds.map { case (n, t) =>
      s"WHEN entity = '$n' THEN daily_avg > $t"
    }.mkString(" ") + " ELSE false END"

  /** Unrounded daily layer over orders — shared by monthly/annual. */
  private def ordersDaily(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    Pyramid.daily(o, col("o_orderpriority"), col("o_orderdate"), col("o_totalprice"))
  }

  private def ordersMonthly(spark: SparkSession, dir: String): DataFrame = {
    val d = ordersDaily(spark, dir)
    Pyramid.monthly(d,
      Pyramid.thresholdChain(col("entity"), col("daily_avg"), orderThresholds))
  }

  /** Shared daily-layer oracle CTE over orders — fixed-point mean
    * mirroring [[graft.functions.gf.fixed]]/[[graft.functions.gf.meanFromFixed]].
    */
  private val dailySqlCte =
    """d AS (
      |  SELECT o_orderpriority AS entity, CAST(o_orderdate AS DATE) AS date_local,
      |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) / 100.0 AS daily_avg,
      |         max(o_totalprice) AS daily_max
      |  FROM orders GROUP BY 1, 2)""".stripMargin

  private def monthlySqlCte =
    s"""$dailySqlCte,
       |m AS (
       |  SELECT entity, CAST(year(date_local) AS INT) AS year,
       |         CAST(month(date_local) AS INT) AS month,
       |         CAST(sum(CAST(floor(daily_avg * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |           / count(*) / 1000000.0 AS monthly_avg,
       |         max(daily_max) AS monthly_max,
       |         count(*) AS days_with_data,
       |         CAST(sum(CASE WHEN $thresholdSqlChain THEN 1 ELSE 0 END) AS BIGINT)
       |           AS exceedance_days
       |  FROM d GROUP BY 1, 2, 3)""".stripMargin

  def q21Daily(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    Pyramid.daily(e, col("event_type"), col("ts"), col("value"))
      .select(
        col("entity"),
        date_format(col("date_local"), "yyyy-MM-dd").as("date_local"),
        gf.dround(col("daily_avg"), 3).as("daily_avg"),
        gf.dround(col("daily_max"), 2).as("daily_max"),
        col("measurement_count"),
        col("day_of_week"),
        col("is_weekend"))
      .orderBy(col("entity"), col("date_local"))
  }

  def q22Monthly(spark: SparkSession, dir: String): DataFrame =
    ordersMonthly(spark, dir)
      .select(
        col("entity"), col("year"), col("month"),
        gf.dround(col("monthly_avg"), 2).as("monthly_avg"),
        gf.dround(col("monthly_max"), 2).as("monthly_max"),
        col("days_with_data"),
        col("exceedance_days"),
        gf.dround(col("prev_month_avg"), 2).as("prev_month_avg"),
        gf.dround(col("mom_pct_change"), 3).as("mom_pct_change"),
        gf.dround(col("same_month_prev_year_avg"), 2).as("same_month_prev_year_avg"),
        gf.dround(col("yoy_month_change"), 3).as("yoy_month_change"))
      .orderBy(col("entity"), col("year"), col("month"))

  def q23Annual(spark: SparkSession, dir: String): DataFrame =
    Pyramid.annual(ordersMonthly(spark, dir))
      .select(
        col("entity"), col("year"),
        gf.dround(col("annual_avg"), 2).as("annual_avg"),
        gf.dround(col("annual_max"), 2).as("annual_max"),
        col("total_exceedance_days"),
        gf.dround(col("prev_year_avg"), 2).as("prev_year_avg"),
        gf.dround(col("yoy_avg_change"), 3).as("yoy_avg_change"),
        gf.dround(col("yoy_pct_change"), 3).as("yoy_pct_change"),
        col("cumulative_exceedance_days"))
      .orderBy(col("entity"), col("year"))

  def q24Baselines(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    Pyramid.baselines(e, col("event_type"), col("ts"), col("value"))
      .select(
        col("entity"), col("month"), col("hour"), col("is_weekend"),
        gf.dround(col("baseline_avg"), 3).as("baseline_avg"),
        gf.dround(col("baseline_stddev"), 3).as("baseline_stddev"),
        col("sample_count"))
      .orderBy(col("entity"), col("month"), col("hour"), col("is_weekend"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_daily_rollup" -> q21Daily,
    "q22_monthly_rollup" -> q22Monthly,
    "q23_annual_rollup" -> q23Annual,
    "q24_hourly_baselines" -> q24Baselines)

  val oracles: Map[String, String] = Map(
    "q21_daily_rollup" ->
      """WITH d AS (
        |  SELECT event_type AS entity, CAST(ts AS DATE) AS date_local,
        |         round(CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |           / count(*) / 100.0, 3) AS daily_avg,
        |         round(max(value), 2) AS daily_max,
        |         count(*) AS measurement_count
        |  FROM events GROUP BY 1, 2)
        |SELECT entity, strftime(date_local, '%Y-%m-%d') AS date_local,
        |       daily_avg, daily_max, measurement_count,
        |       CAST(dayofweek(date_local) + 1 AS INT) AS day_of_week,
        |       dayofweek(date_local) IN (0, 6) AS is_weekend
        |FROM d ORDER BY entity, date_local""".stripMargin,
    "q22_monthly_rollup" ->
      s"""WITH $monthlySqlCte,
         |w AS (
         |  SELECT *,
         |    lag(monthly_avg) OVER (PARTITION BY entity ORDER BY year, month)
         |      AS prev_month_avg,
         |    lag(monthly_avg) OVER (PARTITION BY entity, month ORDER BY year)
         |      AS same_month_prev_year_avg
         |  FROM m)
         |SELECT entity, year, month,
         |  round(monthly_avg, 2) AS monthly_avg,
         |  round(monthly_max, 2) AS monthly_max,
         |  days_with_data, exceedance_days,
         |  round(prev_month_avg, 2) AS prev_month_avg,
         |  round((monthly_avg - prev_month_avg) / prev_month_avg * 100, 3)
         |    AS mom_pct_change,
         |  round(same_month_prev_year_avg, 2) AS same_month_prev_year_avg,
         |  round(monthly_avg - same_month_prev_year_avg, 3) AS yoy_month_change
         |FROM w ORDER BY entity, year, month""".stripMargin,
    "q23_annual_rollup" ->
      s"""WITH $monthlySqlCte,
         |a AS (
         |  SELECT entity, year,
         |         CAST(sum(CAST(floor(monthly_avg * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
         |           / count(*) / 1000000.0 AS annual_avg,
         |         max(monthly_max) AS annual_max,
         |         CAST(sum(exceedance_days) AS BIGINT) AS total_exceedance_days
         |  FROM m GROUP BY 1, 2),
         |w AS (
         |  SELECT *,
         |    lag(annual_avg) OVER (PARTITION BY entity ORDER BY year) AS prev_year_avg,
         |    CAST(sum(total_exceedance_days) OVER (PARTITION BY entity ORDER BY year
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cumulative_exceedance_days
         |  FROM a)
         |SELECT entity, year,
         |  round(annual_avg, 2) AS annual_avg,
         |  round(annual_max, 2) AS annual_max,
         |  total_exceedance_days,
         |  round(prev_year_avg, 2) AS prev_year_avg,
         |  round(annual_avg - prev_year_avg, 3) AS yoy_avg_change,
         |  round((annual_avg - prev_year_avg) / prev_year_avg * 100, 3)
         |    AS yoy_pct_change,
         |  cumulative_exceedance_days
         |FROM w ORDER BY entity, year""".stripMargin,
    "q24_hourly_baselines" ->
      """WITH b AS (
        |  SELECT event_type AS entity,
        |    CAST(month(ts) AS INT) AS month,
        |    CAST(hour(ts) AS INT) AS hour,
        |    dayofweek(CAST(ts AS DATE)) IN (0, 6) AS is_weekend,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) AS s,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
        |           * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) AS s2,
        |    count(*) AS sample_count
        |  FROM events GROUP BY 1, 2, 3, 4)
        |SELECT entity, month, hour, is_weekend,
        |  round(s / sample_count / 100.0, 3) AS baseline_avg,
        |  round(CASE WHEN sample_count > 1
        |    THEN sqrt(greatest(0.0, (s2 - s * s / sample_count) / (sample_count - 1))) / 100.0
        |    ELSE NULL END, 3) AS baseline_stddev,
        |  sample_count
        |FROM b
        |ORDER BY entity, month, hour, is_weekend""".stripMargin)
}
