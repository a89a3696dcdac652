package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.WindowOps

/** The reference's ten analytical queries (ASVSP q01..q10 under `src/queries`),
  * re-expressed Spark-first over the pyramid-layer schemas, preserving
  * the exact output contract: column aliases (Serbian, as published),
  * rounding points, rank/limit semantics, and ordering.
  *
  * Inputs are the reference table schemas — `annual_state_measurements`,
  * `monthly_state_measurements`, `daily_state_measurements` — already
  * filtered to one pollutant (every reference query starts with
  * `WHERE pollutant = 'PM25'`; partition pruning happens there). The
  * pyramid layers produced by [[graft.operators.Pyramid]] adapt via a
  * rename of `entity` → `state_name` (+ derived year/month where the
  * reference reads partition columns).
  *
  * A reference user can hand these functions their existing tables and
  * get their existing answers.
  */
object EpaQueries {

  /** Q01 (`q01_state_ranking_yoy.sql`): top-10 states per year by
    * annual average, with rank change vs previous year (NVL → 0).
    */
  def q01StateRankingYoy(annual: DataFrame): DataFrame = {
    val ranked = annual.withColumn("state_rank",
      rank().over(Window.partitionBy(col("year")).orderBy(col("annual_avg").desc)))
    val withPrev = ranked
      .withColumn("prethodni_rang",
        lag(col("state_rank"), 1).over(
          Window.partitionBy(col("state_name")).orderBy(col("year"))))
      .select(
        col("state_name").as("drzava"),
        col("year").as("godina"),
        round(col("annual_avg"), 2).as("godisnji_prosjek"),
        col("yoy_pct_change").as("promjena_yoy_pct"),
        col("state_rank").as("rang"),
        col("prethodni_rang"),
        coalesce(col("prethodni_rang") - col("state_rank"), lit(0)).as("promjena_ranga"))
    withPrev.filter(col("rang") <= 10).orderBy(col("godina"), col("rang"))
  }

  /** Q02 (`q02_peak_month.sql`): peak month per state-year ⋈ each
    * state's most frequent peak month (`freq_rank = 1` in the ON).
    */
  def q02PeakMonth(monthly: DataFrame): DataFrame = {
    val peak = monthly.withColumn("month_rank",
        rank().over(Window.partitionBy(col("state_name"), col("year"))
          .orderBy(col("monthly_avg").desc)))
      .filter(col("month_rank") === 1)
      .select(col("state_name"), col("year"),
        col("month").as("najzagadjeniji_mjesec"),
        round(col("monthly_avg"), 2).as("prosjek_najzagadjenijeg_mjeseca"))
    val freq = peak.groupBy(col("state_name").as("f_state"),
        col("najzagadjeniji_mjesec").as("najcesci_vrsni_mjesec"))
      .agg(count(lit(1)).as("broj_godina_na_vrhu"))
    val mf = freq.withColumn("freq_rank",
      rank().over(Window.partitionBy(col("f_state"))
        .orderBy(col("broj_godina_na_vrhu").desc)))
    peak.join(mf, peak("state_name") === mf("f_state") && mf("freq_rank") === 1)
      .select(
        peak("state_name").as("drzava"), col("year").as("godina"),
        col("najzagadjeniji_mjesec"), col("prosjek_najzagadjenijeg_mjeseca"),
        col("najcesci_vrsni_mjesec"), col("broj_godina_na_vrhu"))
      .orderBy(col("prosjek_najzagadjenijeg_mjeseca").desc)
      .limit(50)
  }

  /** Q03 (`q03_cumulative_exceedances.sql`): all annual rows of the 10
    * states with the highest cumulative exceedance totals.
    */
  def q03CumulativeExceedances(annual: DataFrame): DataFrame = {
    val top = annual.groupBy(col("state_name"))
      .agg(max(col("cumulative_exceedance_days")).as("ukupno_kumulativno"))
      .orderBy(col("ukupno_kumulativno").desc)
      .limit(10)
      .select(col("state_name").as("t_state"))
    annual.join(broadcast(top), annual("state_name") === col("t_state"))
      .select(
        col("state_name").as("drzava"), col("year").as("godina"),
        col("total_exceedance_days").as("prekoracenja_u_godini"),
        col("cumulative_exceedance_days").as("kumulativna_prekoracenja"))
      .orderBy(col("kumulativna_prekoracenja").desc, col("drzava"), col("godina"))
  }

  /** Q04 (`q04_month_over_month.sql`): month-over-month change listing. */
  def q04MonthOverMonth(monthly: DataFrame): DataFrame =
    monthly.select(
        col("state_name").as("drzava"), col("year").as("godina"),
        col("month").as("mjesec"),
        round(col("monthly_avg"), 2).as("mjesecni_prosjek"),
        round(col("prev_month_avg"), 2).as("prosjek_prethodnog_mjeseca"),
        col("mom_pct_change").as("promjena_mom_pct"))
      .orderBy(col("drzava"), col("godina"), col("mjesec"))

  /** Q05 (`q05_same_month_yoy.sql`): top-10 improvement and top-10
    * worsening by average same-month YoY change (dual rank, null rows
    * excluded).
    */
  def q05SameMonthYoy(monthly: DataFrame): DataFrame = {
    val perState = monthly
      .filter(col("same_month_prev_year_avg").isNotNull)
      .groupBy(col("state_name"))
      .agg(round(avg(col("yoy_month_change")), 4).as("prosjecna_yoy_promjena"))
    val ranked = WindowOps.dualRank(perState, Seq.empty,
      col("prosjecna_yoy_promjena"),
      bestCol = "rang_pogorsanja", worstCol = "rang_poboljsanja")
    ranked
      .filter(col("rang_poboljsanja") <= 10 || col("rang_pogorsanja") <= 10)
      .select(
        col("state_name").as("drzava"),
        col("prosjecna_yoy_promjena"),
        when(col("rang_poboljsanja") <= 10, "Top 10 poboljšanje")
          .when(col("rang_pogorsanja") <= 10, "Top 10 pogoršanje")
          .as("kategorija"),
        col("rang_poboljsanja"), col("rang_pogorsanja"))
      .orderBy(col("prosjecna_yoy_promjena").asc)
  }

  /** Q06 (`q06_moving_average.sql`): date of the highest 30-day moving
    * average per state-year (window partitioned by state ONLY — crosses
    * year boundaries; the rank does not).
    */
  def q06MovingAverage(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("state_name")).orderBy(col("date_local"))
      .rowsBetween(-29, Window.currentRow)
    val ma = daily
      .withColumn("godina", year(col("date_local")))
      .withColumn("dnevni_prosjek", round(col("daily_avg"), 2))
      .withColumn("pokretni_prosjek_30d", round(avg(col("daily_avg")).over(w), 2))
    ma.withColumn("rn",
        rank().over(Window.partitionBy(col("state_name"), col("godina"))
          .orderBy(col("pokretni_prosjek_30d").desc)))
      .filter(col("rn") === 1)
      .select(
        col("state_name").as("drzava"), col("godina"),
        col("date_local").as("vrsni_datum"),
        col("dnevni_prosjek"),
        col("pokretni_prosjek_30d").as("vrsni_pokretni_prosjek_30d"))
      .orderBy(col("vrsni_pokretni_prosjek_30d").desc)
      .limit(50)
  }

  /** Q07 (`q07_percentile_classification.sql`): quartiles over ALL of a
    * state's days (partition by state only), regrouped per state-year.
    */
  def q07PercentileClassification(daily: DataFrame): DataFrame = {
    val q = daily.withColumn("kvartil",
      ntile(4).over(Window.partitionBy(col("state_name"))
        .orderBy(col("daily_avg").desc)))
    q.groupBy(col("state_name").as("drzava"), col("year").as("godina"), col("kvartil"))
      .agg(count(lit(1)).as("broj_dana"))
      .withColumn("oznaka_kvartila",
        when(col("kvartil") === 1, "Gornji kvartal (najzagađenije 25%)")
          .when(col("kvartil") === 2, "Drugi kvartal (25–50%)")
          .when(col("kvartil") === 3, "Treći kvartal (50–75%)")
          .otherwise("Donji kvartal (najmanje zagađeno 25%)"))
      .orderBy(col("drzava"), col("godina"), col("kvartil"))
  }

  /** Q08 (`q08_covid_impact.sql`): Mar–May 2020 vs 2019, top-15 by
    * percent reduction. Years are the reference's literal spec.
    */
  def q08CovidImpact(monthly: DataFrame): DataFrame = {
    def period(yr: Int, alias: String) =
      monthly.filter(col("year") === yr && col("month").isin(3, 4, 5))
        .groupBy(col("state_name").as(s"s_$yr"))
        .agg(avg(col("monthly_avg")).as(alias))
    val p19 = period(2019, "prosjek_2019")
    val p20 = period(2020, "prosjek_2020")
    val cmp = p19.join(p20, col("s_2019") === col("s_2020"))
      .select(
        col("s_2019").as("drzava"),
        round(col("prosjek_2019"), 2).as("prosjek_mart_maj_2019"),
        round(col("prosjek_2020"), 2).as("prosjek_mart_maj_2020"),
        round((col("prosjek_2019") - col("prosjek_2020")) / col("prosjek_2019") * 100, 2)
          .as("smanjenje_pct"))
    cmp.withColumn("rang_smanjenja",
        rank().over(Window.orderBy(col("smanjenje_pct").desc)))
      .orderBy(col("smanjenje_pct").desc)
      .limit(15)
  }

  /** Q09 (`q09_weekend_effect.sql`): top-10 largest and smallest
    * weekend/weekday ratios (conditional AVG + dual rank).
    */
  def q09WeekendEffect(daily: DataFrame): DataFrame = {
    val ww = daily.groupBy(col("state_name"))
      .agg(
        avg(when(col("is_weekend"), col("daily_avg"))).as("w_avg"),
        avg(when(!col("is_weekend"), col("daily_avg"))).as("d_avg"))
      .withColumn("ratio", col("w_avg") / col("d_avg"))
    val ranked = ww
      .withColumn("rang_najveci_efekat", rank().over(Window.orderBy(col("ratio").desc)))
      .withColumn("rang_najmanji_efekat", rank().over(Window.orderBy(col("ratio").asc)))
    ranked
      .filter(col("rang_najveci_efekat") <= 10 || col("rang_najmanji_efekat") <= 10)
      .select(
        col("state_name").as("drzava"),
        round(col("w_avg"), 2).as("prosjek_vikend"),
        round(col("d_avg"), 2).as("prosjek_radni_dan"),
        round(col("ratio"), 3).as("omjer_vikend_radni"),
        when(col("rang_najveci_efekat") <= 10, "Top 10 vikend efekat")
          .when(col("rang_najmanji_efekat") <= 10, "Top 10 bez vikend efekta")
          .as("kategorija"))
      .orderBy(col("omjer_vikend_radni").desc)
  }

  /** Q10 (`q10_consecutive_improvement.sql`): longest run of
    * consecutive month-over-month DECLINES per state (gaps-and-islands;
    * decline = growth of the negated value).
    */
  def q10ConsecutiveImprovement(monthly: DataFrame): DataFrame = {
    val ym = (col("year") * 100 + col("month")).as("ym")
    val base = monthly.select(col("state_name"), ym, (-col("monthly_avg")).as("neg_avg"))
    val streaks = WindowOps.growthStreaks(base, Seq(col("state_name")),
      col("ym"), col("neg_avg"))
    streaks.groupBy(col("state_name").as("drzava"))
      .agg(max(col("streak_len")).as("najduzi_niz_mjeseci"))
      .orderBy(col("najduzi_niz_mjeseci").desc)
      .limit(15)
  }
}
