package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.gf

/** The materialized-aggregate pyramid: hourly → daily → monthly → annual
  * (+ hour-of-day baselines), generalized from the reference's EPA pipeline
  * (ASVSP `daily_aggregation.py`, `monthly_aggregation.py`,
  * `annual_aggregation.py`, `baselines.py`) to any (entity, timestamp,
  * value) measurement table.
  *
  * Semantics preserved exactly (SURVEY.md §2.9):
  *   - `is_weekend` = `dayofweek ∈ {1,7}` (Sunday=1, Saturday=7) —
  *     `daily_aggregation.py:26`;
  *   - rollups are unweighted avg-of-avgs — `monthly_aggregation.py:32-37`,
  *     `annual_aggregation.py:20-24`;
  *   - exceedance counting = `sum(when(flag,1).otherwise(0))` over a
  *     per-entity threshold when-chain — `monthly_aggregation.py:21-37`;
  *   - pct-change ratios propagate nulls (no zero-guards) —
  *     `monthly_aggregation.py:44-47`;
  *   - `stddev` is the sample stddev — `baselines.py:25-30`.
  *
  * Numerics: every mean/stddev is computed by fixed-point aggregation
  * ([[gf.fixed]]) — quantize to integer units, sum longs (exact,
  * order-independent), divide once at the end. A double-summing aggregate
  * is not reproducible across partitionings; this one is bit-identical at
  * any parallelism, run-to-run, and vs a single-node oracle.
  *
  * All transforms are pure `DataFrame => DataFrame` (no I/O) and return
  * full-precision columns; callers round at the output boundary. Each
  * stage is one hash-aggregate shuffle on a low-cardinality composite key
  * + (for the window stages) one shuffle on the entity key; partial
  * aggregation runs map-side, so the plan shape holds at 100 TB. In
  * production each layer is persisted `partitionBy(entity[, year, month])`
  * exactly like the reference's Hive layout, so downstream scans prune.
  */
object Pyramid {

  /** Input values are fixed 2-decimal; averages quantized at 6 decimals. */
  val ValueScale = 100.0
  val MeanScale = 1000000.0

  /** Daily aggregation (A1 + P11): avg/max/count by entity × calendar day,
    * plus day-of-week and weekend flags. Mirrors `daily_aggregation.py:19-28`.
    */
  def daily(df: DataFrame, entity: Column, ts: Column, value: Column): DataFrame = {
    val date = to_date(ts)
    df.groupBy(entity.as("entity"), date.as("date_local"))
      .agg(
        sum(gf.fixed(value, ValueScale)).as("sum_fixed"),
        max(value).as("daily_max"),
        count(lit(1)).as("measurement_count"))
      .withColumn("daily_avg",
        gf.meanFromFixed(col("sum_fixed"), col("measurement_count"), ValueScale))
      .drop("sum_fixed")
      .withColumn("day_of_week", dayofweek(col("date_local")))
      .withColumn("is_weekend", col("day_of_week").isin(1, 7))
  }

  /** Per-entity threshold when-chain (P7): mirrors the NAAQS chain at
    * `monthly_aggregation.py:21-30` — entities missing from the map never
    * exceed (the reference chain has no otherwise-true branch either).
    */
  def thresholdChain(entity: Column, value: Column,
                     thresholds: Seq[(String, Double)]): Column =
    thresholds.foldLeft(lit(false)) { case (acc, (name, t)) =>
      when(entity === name, value > t).otherwise(acc)
    }

  /** Monthly rollup from [[daily]] output (A2, A3, W5, W6): unweighted
    * avg-of-avgs, exceedance-day counting, month-over-month lag and
    * same-month-previous-year lag. Mirrors `monthly_aggregation.py:32-53`.
    */
  def monthly(dailyDf: DataFrame, exceeds: Column): DataFrame = {
    val byMonth = dailyDf
      .withColumn("year", year(col("date_local")))
      .withColumn("month", month(col("date_local")))
      .withColumn("exceeds", exceeds)
      .groupBy(col("entity"), col("year"), col("month"))
      .agg(
        sum(gf.fixed(col("daily_avg"), MeanScale)).as("sum_fixed"),
        max(col("daily_max")).as("monthly_max"),
        count(lit(1)).as("days_with_data"),
        sum(when(col("exceeds"), 1).otherwise(0)).as("exceedance_days"))
      .withColumn("monthly_avg",
        gf.meanFromFixed(col("sum_fixed"), col("days_with_data"), MeanScale))
      .drop("sum_fixed")
    val wMom = Window.partitionBy(col("entity")).orderBy(col("year"), col("month"))
    val wYoy = Window.partitionBy(col("entity"), col("month")).orderBy(col("year"))
    byMonth
      .withColumn("prev_month_avg", lag(col("monthly_avg"), 1).over(wMom))
      .withColumn("mom_pct_change",
        (col("monthly_avg") - col("prev_month_avg")) / col("prev_month_avg") * 100)
      .withColumn("same_month_prev_year_avg", lag(col("monthly_avg"), 1).over(wYoy))
      .withColumn("yoy_month_change",
        col("monthly_avg") - col("same_month_prev_year_avg"))
  }

  /** Annual rollup from [[monthly]] output (A3, W7, W8): avg-of-avgs,
    * year-over-year deltas, cumulative exceedance running total.
    * Mirrors `annual_aggregation.py:20-44`.
    */
  def annual(monthlyDf: DataFrame): DataFrame = {
    val byYear = monthlyDf
      .groupBy(col("entity"), col("year"))
      .agg(
        sum(gf.fixed(col("monthly_avg"), MeanScale)).as("sum_fixed"),
        count(lit(1)).as("months_with_data"),
        max(col("monthly_max")).as("annual_max"),
        sum(col("exceedance_days")).as("total_exceedance_days"))
      .withColumn("annual_avg",
        gf.meanFromFixed(col("sum_fixed"), col("months_with_data"), MeanScale))
      .drop("sum_fixed")
    val w = Window.partitionBy(col("entity")).orderBy(col("year"))
    byYear
      .withColumn("prev_year_avg", lag(col("annual_avg"), 1).over(w))
      .withColumn("yoy_avg_change", col("annual_avg") - col("prev_year_avg"))
      .withColumn("yoy_pct_change",
        (col("annual_avg") - col("prev_year_avg")) / col("prev_year_avg") * 100)
      .withColumn("cumulative_exceedance_days",
        sum(col("total_exceedance_days"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Hour-of-day baselines (A4): mean and sample stddev per entity ×
    * month × hour × weekend-flag. Mirrors `baselines.py:19-30`.
    */
  def baselines(df: DataFrame, entity: Column, ts: Column, value: Column): DataFrame = {
    val v = gf.fixed(value, ValueScale)
    df.groupBy(
        entity.as("entity"),
        month(ts).as("month"),
        hour(ts).as("hour"),
        dayofweek(to_date(ts)).isin(1, 7).as("is_weekend"))
      .agg(
        sum(v).as("sum_fixed"),
        sum(v * v).as("sum_sq_fixed"),
        count(lit(1)).as("sample_count"))
      .withColumn("baseline_avg",
        gf.meanFromFixed(col("sum_fixed"), col("sample_count"), ValueScale))
      .withColumn("baseline_stddev",
        gf.stddevFromFixed(col("sum_fixed"), col("sum_sq_fixed"),
          col("sample_count"), ValueScale))
      .drop("sum_fixed", "sum_sq_fixed")
  }
}
