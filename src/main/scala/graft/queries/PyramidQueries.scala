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

  /** sf-keyed lake root for q70's materialized pyramid. */
  def pyramidRoot(dir: String): String =
    s"/root/repo/target/q70_pyramid-${new java.io.File(dir).getName}"

  /** The (year, month) q70 corrupted and refreshed — the spec checks
    * rewritten files against it. */
  @volatile private[graft] var q70Target: (Int, Int) = (0, 0)

  /** Relative data-file paths rewritten by q70's incremental refresh /
    * carried over untouched — dynamic overwrite writes fresh UUID'd
    * part files, so set difference on names is an exact rewrite census.
    */
  @volatile private[graft] var q70Rewritten: Set[String] = Set.empty
  @volatile private[graft] var q70Unchanged: Set[String] = Set.empty

  private def lakeFiles(root: String): Set[String] = {
    val base = java.nio.file.Paths.get(root)
    val out = Set.newBuilder[String]
    java.nio.file.Files.walk(base).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
        out += base.relativize(p).toString
    }
    out.result()
  }

  /** q70 — INCREMENTAL pyramid maintenance (the reference recomputes
    * every layer per run — `daily_aggregation.py:32` reads the whole
    * hourly table; a 100 TB lake re-aggregates only changed
    * partitions). The materialized pyramid lives as four
    * hive-partitioned layers — raw (year, month), daily (year, month),
    * monthly (year, month), annual (year) — each layer built by
    * READING the previous layer's lake, so every refresh input is a
    * partition-PRUNED scan. The run: (1) build the full pyramid from a
    * STALE source whose busiest month (data-derived, count-majority
    * with a total-order tiebreak) carries doubled values; (2) the
    * correction arrives — dynamic-partition-overwrite exactly the
    * touched partitions layer by layer: raw (y,m) from source, daily
    * (y,m) from raw (y,m), monthly (y,m) from daily (y,m), annual (y)
    * from monthly year y. Output is the q23 annual rollup read from
    * the LAKE (window columns computed over the stored base
    * aggregates) against q23's straight-from-source oracle: the hash
    * matches only if the dirty partitions were fully replaced AND
    * every untouched sibling survived — and PyramidSpec additionally
    * asserts from the file census that ONLY the touched partition
    * directories were rewritten.
    */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.sources.MeasurementIngest
    val root = pyramidRoot(dir)
    val src = Tables.load(spark, dir, "orders")
      .select($"o_orderpriority".as("entity"), $"o_orderdate".as("ts"),
        $"o_totalprice".as("value"))
    val tgt = src.groupBy(year($"ts").as("y"), month($"ts").as("m"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), $"y", $"m").limit(1).head()
    val (ty, tm) = (tgt.getInt(0), tgt.getInt(1))
    q70Target = (ty, tm)
    val stale = src.withColumn("value",
      when(year($"ts") === ty && month($"ts") === tm, $"value" * 2)
        .otherwise($"value"))
    def rawOut(df: DataFrame) = df
      .withColumn("year", year($"ts")).withColumn("month", month($"ts"))
    def daily(raw: DataFrame) =
      Pyramid.daily(raw, $"entity", $"ts", $"value")
        .withColumn("year", year($"date_local"))
        .withColumn("month", month($"date_local"))
    // the base aggregates of Pyramid.monthly/annual — window columns
    // (lags, cumulative) are NOT materialized: they read neighboring
    // partitions, so they belong to read time, where they reconstruct
    // bit-identically from the stored fixed-point bases
    def monthlyBase(d: DataFrame) = d
      .withColumn("exceeds",
        Pyramid.thresholdChain($"entity", $"daily_avg", orderThresholds))
      .groupBy($"entity", $"year", $"month")
      .agg(sum(gf.fixed($"daily_avg", Pyramid.MeanScale)).as("sum_fixed"),
        max($"daily_max").as("monthly_max"),
        count(lit(1)).as("days_with_data"),
        sum(when($"exceeds", 1).otherwise(0)).as("exceedance_days"))
      .withColumn("monthly_avg",
        gf.meanFromFixed($"sum_fixed", $"days_with_data", Pyramid.MeanScale))
      .drop("sum_fixed")
    def annualBase(m: DataFrame) = m
      .groupBy($"entity", $"year")
      .agg(sum(gf.fixed($"monthly_avg", Pyramid.MeanScale)).as("sum_fixed"),
        count(lit(1)).as("months_with_data"),
        max($"monthly_max").as("annual_max"),
        sum($"exceedance_days").as("total_exceedance_days"))
      .withColumn("annual_avg",
        gf.meanFromFixed($"sum_fixed", $"months_with_data", Pyramid.MeanScale))
      .drop("sum_fixed")
    def rawLake() = spark.read.parquet(s"$root/raw")
    def dailyLake() = spark.read.parquet(s"$root/daily")
    def monthlyLake() = spark.read.parquet(s"$root/monthly")
    // (1) full build from the STALE source, layer reading layer
    rawOut(stale).write.mode("overwrite")
      .partitionBy("year", "month").parquet(s"$root/raw")
    daily(rawLake()).write.mode("overwrite")
      .partitionBy("year", "month").parquet(s"$root/daily")
    monthlyBase(dailyLake()).write.mode("overwrite")
      .partitionBy("year", "month").parquet(s"$root/monthly")
    annualBase(monthlyLake()).write.mode("overwrite")
      .partitionBy("year").parquet(s"$root/annual")
    val before = lakeFiles(root)
    // (2) the correction: refresh ONLY the touched partitions
    MeasurementIngest.overwritePartitionsDynamic(
      rawOut(src.filter(year($"ts") === ty && month($"ts") === tm)),
      s"$root/raw", Seq("year", "month"))
    MeasurementIngest.overwritePartitionsDynamic(
      daily(rawLake().filter($"year" === ty && $"month" === tm)),
      s"$root/daily", Seq("year", "month"))
    MeasurementIngest.overwritePartitionsDynamic(
      monthlyBase(dailyLake().filter($"year" === ty && $"month" === tm)),
      s"$root/monthly", Seq("year", "month"))
    MeasurementIngest.overwritePartitionsDynamic(
      annualBase(monthlyLake().filter($"year" === ty)),
      s"$root/annual", Seq("year"))
    val after = lakeFiles(root)
    q70Rewritten = after -- before
    q70Unchanged = after.intersect(before)
    // read-time windows over the refreshed annual layer — q23's shape
    val w = Window.partitionBy($"entity").orderBy($"year")
    spark.read.parquet(s"$root/annual")
      .withColumn("prev_year_avg", lag($"annual_avg", 1).over(w))
      .withColumn("yoy_avg_change", $"annual_avg" - $"prev_year_avg")
      .withColumn("yoy_pct_change",
        ($"annual_avg" - $"prev_year_avg") / $"prev_year_avg" * 100)
      .withColumn("cumulative_exceedance_days",
        sum($"total_exceedance_days")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        $"entity", $"year",
        gf.dround($"annual_avg", 2).as("annual_avg"),
        gf.dround($"annual_max", 2).as("annual_max"),
        $"total_exceedance_days",
        gf.dround($"prev_year_avg", 2).as("prev_year_avg"),
        gf.dround($"yoy_avg_change", 3).as("yoy_avg_change"),
        gf.dround($"yoy_pct_change", 3).as("yoy_pct_change"),
        $"cumulative_exceedance_days")
      .orderBy($"entity", $"year")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_daily_rollup" -> q21Daily,
    "q22_monthly_rollup" -> q22Monthly,
    "q23_annual_rollup" -> q23Annual,
    "q24_hourly_baselines" -> q24Baselines,
    "q70_incremental_pyramid" -> q70)

  /** q23's straight-from-source pyramid SQL — q70's oracle too: the
    * incrementally-maintained lake must land exactly where a full
    * recompute lands.
    */
  private def annualRollupSql: String =
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
       |FROM w ORDER BY entity, year""".stripMargin

  val oracles: Map[String, String] = Map(
    "q70_incremental_pyramid" -> annualRollupSql,
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
    "q23_annual_rollup" -> annualRollupSql,
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
