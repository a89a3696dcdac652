package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pyramid
import graft.functions.gf

/** Semantics tests for the pyramid transforms against hand-computed
  * micro-fixtures (SURVEY.md §2.9 correctness traps).
  */
class PyramidSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("pyramid-spec")
  import java.sql.Timestamp

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  lazy val fixture = {
    import spark.implicits._
    // 2024-01-06 = Saturday, 2024-01-07 = Sunday, 2024-01-08 = Monday
    Seq(
      ("a", ts("2024-01-06 01:00:00"), 10.00),
      ("a", ts("2024-01-06 02:00:00"), 20.00),
      ("a", ts("2024-01-07 01:00:00"), 40.00),
      ("a", ts("2024-01-08 01:00:00"), 100.00),
      ("b", ts("2024-01-08 01:00:00"), 7.50)
    ).toDF("entity", "ts", "value")
  }

  test("daily: avg/max/count + Sunday=1 weekend convention") {
    val d = Pyramid.daily(fixture, col("entity"), col("ts"), col("value"))
      .orderBy("entity", "date_local").collect()
    assert(d.length == 4)
    val sat = d(0)
    assert(sat.getAs[Double]("daily_avg") == 15.0)
    assert(sat.getAs[Double]("daily_max") == 20.0)
    assert(sat.getAs[Long]("measurement_count") == 2L)
    assert(sat.getAs[Int]("day_of_week") == 7) // Saturday
    assert(sat.getAs[Boolean]("is_weekend"))
    val sun = d(1)
    assert(sun.getAs[Int]("day_of_week") == 1) // Sunday=1
    assert(sun.getAs[Boolean]("is_weekend"))
    val mon = d(2)
    assert(mon.getAs[Int]("day_of_week") == 2)
    assert(!mon.getAs[Boolean]("is_weekend"))
  }

  test("monthly: avg-of-avgs (unweighted), exceedance count, lag nulls") {
    import spark.implicits._
    val daily = Seq(
      // entity a: Jan has days avg 10 and 30 (avg-of-avgs 20, NOT
      // count-weighted), Feb avg 40; threshold 25 → 1 exceedance in Jan
      ("a", java.sql.Date.valueOf("2024-01-01"), 10.0, 12.0),
      ("a", java.sql.Date.valueOf("2024-01-02"), 30.0, 33.0),
      ("a", java.sql.Date.valueOf("2024-02-01"), 40.0, 44.0)
    ).toDF("entity", "date_local", "daily_avg", "daily_max")
    val m = Pyramid.monthly(daily,
        Pyramid.thresholdChain(col("entity"), col("daily_avg"), Seq("a" -> 25.0)))
      .orderBy("year", "month").collect()
    assert(m(0).getAs[Double]("monthly_avg") == 20.0)
    assert(m(0).getAs[Long]("exceedance_days") == 1L)
    assert(m(0).isNullAt(m(0).fieldIndex("prev_month_avg"))) // no zero-default
    assert(m(0).isNullAt(m(0).fieldIndex("mom_pct_change"))) // null propagates
    assert(m(1).getAs[Double]("prev_month_avg") == 20.0)
    assert(m(1).getAs[Double]("mom_pct_change") == 100.0)
  }

  test("annual: cumulative exceedances + yoy from avg-of-avgs") {
    import spark.implicits._
    val monthly = Seq(
      ("a", 2023, 1, 10.0, 11.0, 2L),
      ("a", 2023, 2, 30.0, 31.0, 1L),
      ("a", 2024, 1, 40.0, 41.0, 4L)
    ).toDF("entity", "year", "month", "monthly_avg", "monthly_max", "exceedance_days")
    val a = Pyramid.annual(monthly).orderBy("year").collect()
    assert(a(0).getAs[Double]("annual_avg") == 20.0)
    assert(a(0).getAs[Long]("cumulative_exceedance_days") == 3L)
    assert(a(1).getAs[Long]("cumulative_exceedance_days") == 7L)
    assert(a(1).getAs[Double]("yoy_pct_change") == 100.0)
    assert(a(0).isNullAt(a(0).fieldIndex("yoy_pct_change")))
  }

  test("baselines: sample stddev, null for n=1") {
    val b = Pyramid.baselines(fixture, col("entity"), col("ts"), col("value"))
      .orderBy("entity", "hour").collect()
    // a@01 weekend bucket: values 10 and 40 → avg 25, sample stddev ~21.2132
    val a1 = b.find(r => r.getAs[String]("entity") == "a" &&
      r.getAs[Int]("hour") == 1 && r.getAs[Boolean]("is_weekend")).get
    assert(a1.getAs[Double]("baseline_avg") == 25.0)
    assert(math.abs(a1.getAs[Double]("baseline_stddev") - 21.213203435596427) < 1e-9)
    // b@01 weekday bucket has one sample → stddev null
    val b1 = b.find(r => r.getAs[String]("entity") == "b").get
    assert(b1.isNullAt(b1.fieldIndex("baseline_stddev")))
  }

  test("q70: incremental refresh rewrites ONLY the touched partitions, equals full recompute") {
    import graft.queries.PyramidQueries
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val dir = "/root/testdata/sf0.001"
    val inc = PyramidQueries.q70(spark, dir).collect().map(_.toSeq).toSeq
    // hash-equality with the full recompute: q23 builds the identical
    // annual rollup straight from source, no lake in between
    val full = PyramidQueries.q23Annual(spark, dir).collect().map(_.toSeq).toSeq
    assert(inc == full, "incrementally maintained pyramid diverged from full recompute")
    // file census: every rewritten data file lies under a touched
    // partition directory; untouched siblings survived byte-identical
    val (ty, tm) = PyramidQueries.q70Target
    assert(ty > 0 && tm > 0, "q70 did not record its target partition")
    val allowed = Seq(
      s"raw/year=$ty/month=$tm/", s"daily/year=$ty/month=$tm/",
      s"monthly/year=$ty/month=$tm/", s"annual/year=$ty/")
    val rewritten = PyramidQueries.q70Rewritten
    assert(rewritten.nonEmpty, "refresh rewrote nothing")
    val strays = rewritten.filterNot(p => allowed.exists(p.startsWith))
    assert(strays.isEmpty, s"untouched partitions rewritten: ${strays.take(5)}")
    assert(PyramidQueries.q70Unchanged.nonEmpty, "no sibling partition survived")
    // all four layers actually refreshed
    allowed.foreach(a => assert(rewritten.exists(_.startsWith(a)),
      s"layer not refreshed: $a"))
  }

  test("dround matches scaled-double rounding, not BigDecimal rendering") {
    import spark.implicits._
    val got = Seq(44418.4005, 0.1235, -2.675, 1.0005)
      .toDF("x").select(gf.dround(col("x"), 3).as("r"))
      .collect().map(_.getDouble(0))
    // expected = sign*floor(|x|*1000+0.5)/1000 computed in IEEE double
    val exp = Seq(44418.4005, 0.1235, -2.675, 1.0005)
      .map(v => math.signum(v) * math.floor(math.abs(v) * 1000 + 0.5) / 1000)
    assert(got.toSeq == exp)
  }
}
