package graft.model

import java.sql.{Date, Timestamp}

/** Typed row models for the engine's table layers (SURVEY.md §1).
  *
  * `Dataset[T]` views of the pyramid give compile-time field checks to
  * downstream code; the transforms themselves stay `DataFrame`-typed
  * because they are generic over the (entity, ts, value) mapping.
  * Use as `df.as[DailyMeasurement]` at the API boundary.
  */
object Schemas {

  /** Post-ingest hourly grain (ASVSP `load_hourly.py:89-103`). */
  case class HourlyMeasurement(state_code: Int, county_code: Int, site_num: Int,
      state_name: String, pollutant: String, date_local: Date, hour_local: Int,
      measurement: Double, units: String)

  /** Daily rollup grain (`daily_aggregation.py:37-50`), generalized. */
  case class DailyMeasurement(entity: String, date_local: Date, daily_avg: Double,
      daily_max: Double, measurement_count: Long, day_of_week: Int,
      is_weekend: Boolean)

  /** Monthly rollup grain (`monthly_aggregation.py:62-78`). */
  case class MonthlyMeasurement(entity: String, year: Int, month: Int,
      monthly_avg: Double, monthly_max: Double, days_with_data: Long,
      exceedance_days: Long, prev_month_avg: Option[Double],
      mom_pct_change: Option[Double], same_month_prev_year_avg: Option[Double],
      yoy_month_change: Option[Double])

  /** Annual rollup grain (`annual_aggregation.py:53-68`). */
  case class AnnualMeasurement(entity: String, year: Int, annual_avg: Double,
      annual_max: Double, total_exceedance_days: Long,
      prev_year_avg: Option[Double], yoy_avg_change: Option[Double],
      yoy_pct_change: Option[Double], cumulative_exceedance_days: Long)

  /** Hour-of-day baseline grain (`baselines.py:38-50`). */
  case class HourlyBaseline(entity: String, month: Int, hour: Int,
      is_weekend: Boolean, sample_count: Long, baseline_avg: Double,
      baseline_stddev: Option[Double])

  /** Event-stream payload (streaming topics / events table). */
  case class Event(ts: Timestamp, event_type: String, user_id: Long, value: Double)
}
