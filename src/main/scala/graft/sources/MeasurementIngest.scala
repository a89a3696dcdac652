package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EPA-shaped hourly-measurement CSV ingest (SURVEY.md §2.1 S1/S2, §2.2
  * P1–P6), re-expressed Spark-first from ASVSP `load_hourly.py:19-105`.
  *
  * Differences from the reference, by design:
  *   - one `union` of per-file frames + a single partitioned write,
  *     instead of its 54-iteration overwrite/append loop — one job, one
  *     output commit, and Catalyst sees the whole plan;
  *   - the CSV is still read schema-less + cast (bug-compatible with the
  *     reference's `inferSchema=false` string read), but through a
  *     single projection.
  *
  * Load-bearing semantics preserved exactly (SURVEY.md §2.9):
  *   - the full 18-entry truncated-state-name repair map
  *     (`load_hourly.py:44-65` — older EPA files clip at 9 chars);
  *   - NO2/SO2 ppb→ppm ÷1000 plus the unit-label rewrite
  *     (`load_hourly.py:38-41,76-79`);
  *   - hour = first two chars of `"HH:MM"` cast int (`load_hourly.py:36`).
  */
object MeasurementIngest {

  /** P5: 18 truncated names from EPA's 9-char column limit. */
  val StateNameRepairs: Seq[(String, String)] = Seq(
    "Californi" -> "California",
    "Connectic" -> "Connecticut",
    "Country O" -> "Country Of Mexico",
    "District" -> "District Of Columbia",
    "Massachus" -> "Massachusetts",
    "Mississip" -> "Mississippi",
    "New Hamps" -> "New Hampshire",
    "New Jerse" -> "New Jersey",
    "New Mexic" -> "New Mexico",
    "North Car" -> "North Carolina",
    "North Dak" -> "North Dakota",
    "Pennsylva" -> "Pennsylvania",
    "Puerto Ri" -> "Puerto Rico",
    "Rhode Isl" -> "Rhode Island",
    "South Car" -> "South Carolina",
    "South Dak" -> "South Dakota",
    "Washingto" -> "Washington",
    "West Virg" -> "West Virginia")

  /** Pollutants measured in ppb upstream, converted to ppm (P4). */
  val PpbPollutants: Set[String] = Set("NO2", "SO2")

  /** S1: header'd CSV, no inference (all strings, cast later). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "false").csv(path)

  /** P1: space → underscore in every column name. */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (d, c) =>
      if (c.contains(" ")) d.withColumnRenamed(c, c.replace(" ", "_")) else d
    }

  /** P5 repair chain — entries fold in reference order. */
  def repairStateName(c: Column): Column =
    StateNameRepairs.foldRight(c) { case ((bad, good), acc) =>
      when(c === bad, lit(good)).otherwise(acc)
    }

  /** P2–P6: the full per-file transform for one pollutant. */
  def transform(raw: DataFrame, pollutant: String): DataFrame = {
    val df = normalizeColumns(raw)
    val measurement =
      if (PpbPollutants(pollutant)) col("Sample_Measurement").cast("double") / 1000.0
      else col("Sample_Measurement").cast("double")
    df.select(
      col("State_Code").cast("int").as("state_code"),
      col("County_Code").cast("int").as("county_code"),
      col("Site_Num").cast("int").as("site_num"),
      repairStateName(col("State_Name")).as("state_name"),
      lit(pollutant).as("pollutant"),
      to_date(col("Date_Local"), "yyyy-MM-dd").as("date_local"),
      substring(col("Time_Local"), 1, 2).cast("int").as("hour_local"),
      measurement.as("measurement"),
      when(col("Units_of_Measure") === "Parts per billion", lit("Parts per million"))
        .otherwise(col("Units_of_Measure")).as("units"))
  }

  /** Ingest many (pollutant, csvPath) files as ONE unioned plan. */
  def ingestAll(spark: SparkSession, files: Seq[(String, String)]): DataFrame =
    files.map { case (p, path) => transform(readCsv(spark, path), p) }
      .reduce(_ unionByName _)

  /** S2: Hive-style partitioned parquet layout, one commit. */
  def writePartitioned(df: DataFrame, out: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy("pollutant").parquet(out)

  /** S2/S3: the reference's full partition layout —
    * `pollutant/year/month` (ASVSP `load_hourly.py:87-105` Hive DDL +
    * MSCK) — with year/month derived from date_local. Reads filtered on
    * any prefix of (pollutant, year, month) are partition-PRUNED at the
    * scan (`PartitionFilters` in the plan; untouched directories are
    * never listed or opened) — the reference's core I/O optimization,
    * asserted end-to-end in MeasurementIngestSpec.
    */
  def writePartitionedByMonth(df: DataFrame, out: String,
                              mode: String = "overwrite"): Unit =
    df.withColumn("year", year(col("date_local")))
      .withColumn("month", month(col("date_local")))
      .write.mode(mode).partitionBy("pollutant", "year", "month").parquet(out)

  /** Idempotent partition backfill: DYNAMIC partition overwrite
    * replaces ONLY the partitions present in the incoming frame and
    * leaves every sibling directory untouched — the re-run/backfill
    * write a daily pipeline needs (static overwrite mode would
    * truncate the whole table first). Per-writer option, so the
    * session default stays static for everyone else.
    */
  def overwritePartitionsDynamic(df: DataFrame, out: String,
                                 partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(out)
}
