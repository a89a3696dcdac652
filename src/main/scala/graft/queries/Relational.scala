package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch relational queries over the TPC-H-ish testdata tables.
  *
  * Each query mirrors an operator pattern from the reference (SURVEY.md §2,
  * citations inline) re-expressed Spark-first, and carries a DuckDB oracle
  * in [[oracles]] with identical column names/ordering so the driver's
  * hash compare passes.
  *
  * Determinism rules shared by every query here:
  *   - every double output is `round(..., 2..4)` (the reference rounds all
  *     outputs too — ASVSP `monthly_aggregation.py:46`, `q01:16`, ...);
  *   - final `orderBy` on non-null key columns, mirrored in the oracle;
  *   - integer outputs cast so Spark and DuckDB types line up
  *     (DuckDB `year()`/`count()` are BIGINT — Spark side casts to long).
  */
object Relational {

  /** q01 — multi-aggregate groupBy (A1: ASVSP `daily_aggregation.py:19-23`;
    * rounding P14). Pricing-summary shape: hash aggregate with partial
    * (map-side) combine; at 100 TB this is a single shuffle on a
    * low-cardinality key — the ideal Spark aggregation.
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
          .as("sum_disc_price"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
