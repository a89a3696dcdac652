package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pyramid
import graft.queries.EpaQueries

/** The reference's Q01–Q10 over a designed EPA-shaped fixture:
  * Alpha declines 5 units/month for 12 months (longest improvement
  * streak), Beta rises symmetrically, Gamma has a +20 weekend boost,
  * Delta is flat. 2 years × 6 months × days 1–7 × 2 hourly samples.
  */
class EpaQueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("epa-queries-spec")

  def base(state: String, idx: Int): Double = state match {
    case "Alpha" => 100.0 - 5.0 * idx
    case "Beta" => 20.0 + 5.0 * idx
    case "Gamma" => 50.0
    case "Delta" => 40.0
  }

  lazy val layers: (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val rows = for {
      state <- Seq("Alpha", "Beta", "Gamma", "Delta")
      y <- Seq(2019, 2020)
      m <- 1 to 6
      d <- 1 to 7
      h <- Seq(1, 13)
    } yield {
      val idx = (y - 2019) * 6 + (m - 1)
      val ts = Timestamp.valueOf(f"$y-$m%02d-$d%02d $h%02d:00:00")
      val dow = java.time.LocalDate.of(y, m, d).getDayOfWeek.getValue // Mon=1..Sun=7
      val weekendBoost = if (state == "Gamma" && dow >= 6) 20.0 else 0.0
      val v = base(state, idx) + (if (h == 1) 0.0 else 2.0) + weekendBoost
      (state, ts, v)
    }
    val hourly = rows.toDF("state", "ts", "v")
    val daily = Pyramid.daily(hourly, col("state"), col("ts"), col("v"))
      .withColumnRenamed("entity", "state_name")
      .withColumn("year", year(col("date_local")))
    val monthly = Pyramid.monthly(
        daily.withColumnRenamed("state_name", "entity"),
        Pyramid.thresholdChain(col("entity"), col("daily_avg"),
          Seq("Alpha" -> 60.0, "Beta" -> 60.0, "Gamma" -> 60.0, "Delta" -> 60.0)))
      .withColumnRenamed("entity", "state_name")
    val annual = Pyramid.annual(monthly.withColumnRenamed("state_name", "entity"))
      .withColumnRenamed("entity", "state_name")
    (daily.cache(), monthly.cache(), annual.cache())
  }
  def daily: DataFrame = layers._1
  def monthly: DataFrame = layers._2
  def annual: DataFrame = layers._3

  test("q01: per-year ranking with rank-change accounting") {
    val rows = EpaQueries.q01StateRankingYoy(annual).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rang") <= 10))
    // 2019: Alpha (avg ~87.5) > Gamma' > Delta > Beta(~32.5)
    val y2019 = rows.filter(_.getAs[Int]("godina") == 2019)
      .sortBy(_.getAs[Int]("rang")).map(_.getAs[String]("drzava")).toSeq
    assert(y2019.head == "Alpha" && y2019.last == "Beta")
    // 2020: Beta (avg ~62.5) overtakes Alpha (~47.5): Beta 1st
    val y2020 = rows.filter(_.getAs[Int]("godina") == 2020)
      .sortBy(_.getAs[Int]("rang")).map(_.getAs[String]("drzava")).toSeq
    assert(y2020.head == "Beta")
    // rank-change consistency: promjena = prethodni - rang (or 0 first year)
    rows.foreach { r =>
      val expected = if (r.isNullAt(r.fieldIndex("prethodni_rang"))) 0
        else r.getAs[Int]("prethodni_rang") - r.getAs[Int]("rang")
      assert(r.getAs[Int]("promjena_ranga") == expected)
    }
  }

  test("q02: peak month per state-year joined to most frequent peak") {
    val rows = EpaQueries.q02PeakMonth(monthly).collect()
    val alpha2019 = rows.find(r => r.getAs[String]("drzava") == "Alpha" &&
      r.getAs[Int]("godina") == 2019).get
    assert(alpha2019.getAs[Int]("najzagadjeniji_mjesec") == 1) // declining → Jan peaks
    assert(alpha2019.getAs[Int]("najcesci_vrsni_mjesec") == 1)
    val beta2020 = rows.find(r => r.getAs[String]("drzava") == "Beta" &&
      r.getAs[Int]("godina") == 2020).get
    assert(beta2020.getAs[Int]("najzagadjeniji_mjesec") == 6) // rising → Jun peaks
  }

  test("q03: top states carry their full annual detail, ordered by cumulative") {
    val rows = EpaQueries.q03CumulativeExceedances(annual).collect()
    assert(rows.length == 8) // 4 states × 2 years, all within top-10
    val cums = rows.map(_.getAs[Long]("kumulativna_prekoracenja"))
    assert(cums.sorted.reverse.toSeq == cums.toSeq)
  }

  test("q04: month-over-month listing with null first month") {
    val rows = EpaQueries.q04MonthOverMonth(monthly).collect()
    assert(rows.length == monthly.count())
    val alphaJan19 = rows.find(r => r.getAs[String]("drzava") == "Alpha" &&
      r.getAs[Int]("godina") == 2019 && r.getAs[Int]("mjesec") == 1).get
    assert(alphaJan19.isNullAt(alphaJan19.fieldIndex("promjena_mom_pct")))
    val alphaFeb19 = rows.find(r => r.getAs[String]("drzava") == "Alpha" &&
      r.getAs[Int]("godina") == 2019 && r.getAs[Int]("mjesec") == 2).get
    // 101→96 (weekday avg includes +1 from the two hourly samples)
    assert(math.abs(alphaFeb19.getAs[Double]("promjena_mom_pct") - (-5.0 / 101 * 100)) < 1e-6)
  }

  test("q05: Alpha is the top improver (most negative yoy change)") {
    val rows = EpaQueries.q05SameMonthYoy(monthly).collect()
    val alpha = rows.find(_.getAs[String]("drzava") == "Alpha").get
    assert(alpha.getAs[Int]("rang_poboljsanja") == 1)
    assert(alpha.getAs[String]("kategorija") == "Top 10 poboljšanje")
    val beta = rows.find(_.getAs[String]("drzava") == "Beta").get
    assert(beta.getAs[Int]("rang_pogorsanja") == 1)
  }

  test("q06: peak 30-day moving average date per state-year") {
    val rows = EpaQueries.q06MovingAverage(daily).collect()
    val alpha = rows.filter(_.getAs[String]("drzava") == "Alpha")
    val a19 = alpha.find(_.getAs[Int]("godina") == 2019).get
    val a20 = alpha.find(_.getAs[Int]("godina") == 2020).get
    assert(a19.getAs[Double]("vrsni_pokretni_prosjek_30d") >
      a20.getAs[Double]("vrsni_pokretni_prosjek_30d"))
  }

  test("q07: quartile day-counts per state-year sum to days observed") {
    val rows = EpaQueries.q07PercentileClassification(daily).collect()
    val alphaTotal = rows.filter(_.getAs[String]("drzava") == "Alpha")
      .map(_.getAs[Long]("broj_dana")).sum
    assert(alphaTotal == 2 * 6 * 7) // all of Alpha's days across both years
    assert(rows.forall(r => Seq(1, 2, 3, 4).contains(r.getAs[Int]("kvartil"))))
    // Alpha declines monotonically → its Q1 (top) days are all in 2019
    val alphaQ1in2020 = rows.find(r => r.getAs[String]("drzava") == "Alpha" &&
      r.getAs[Int]("godina") == 2020 && r.getAs[Int]("kvartil") == 1)
    assert(alphaQ1in2020.isEmpty)
  }

  test("q08: covid window ranks Alpha first by percent reduction") {
    val rows = EpaQueries.q08CovidImpact(monthly).collect()
    assert(rows.length == 4)
    assert(rows.head.getAs[String]("drzava") == "Alpha")
    assert(rows.head.getAs[Int]("rang_smanjenja") == 1)
    assert(rows.head.getAs[Double]("smanjenje_pct") > 0)
    val beta = rows.find(_.getAs[String]("drzava") == "Beta").get
    assert(beta.getAs[Double]("smanjenje_pct") < 0) // Beta got worse
  }

  test("q09: Gamma's weekend boost makes it the top weekend-effect state") {
    val rows = EpaQueries.q09WeekendEffect(daily).collect()
    assert(rows.head.getAs[String]("drzava") == "Gamma")
    assert(rows.head.getAs[Double]("omjer_vikend_radni") > 1.3)
    assert(rows.head.getAs[String]("kategorija") == "Top 10 vikend efekat")
  }

  test("q10: Alpha's 11-month decline is the longest streak; Beta absent") {
    val rows = EpaQueries.q10ConsecutiveImprovement(monthly).collect()
    assert(rows.head.getAs[String]("drzava") == "Alpha")
    assert(rows.head.getAs[Long]("najduzi_niz_mjeseci") == 11L)
    assert(!rows.exists(_.getAs[String]("drzava") == "Beta"))
  }
}
