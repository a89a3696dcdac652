package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.sources.Tables

/** Batch relational queries over the TPC-H-ish testdata tables.
  *
  * Each query mirrors an operator pattern from the reference (SURVEY.md §2,
  * citations inline) re-expressed Spark-first, and carries a DuckDB oracle
  * in [[oracles]] with identical column names/ordering so the driver's
  * hash compare passes.
  *
  * Determinism rules shared by every query here:
  *   - sums/means over doubles go through fixed-point aggregation
  *     ([[gf.fixed]]) so results are exact and order-independent;
  *   - every double output is rounded ([[gf.dround]], mirrored by DuckDB
  *     `round` — the reference rounds all outputs too, ASVSP
  *     `monthly_aggregation.py:46`, `q01:16`);
  *   - final `orderBy` on non-null key columns, mirrored in the oracle;
  *   - integer outputs cast so Spark and DuckDB types line up
  *     (DuckDB `year()` is BIGINT, `sum(INT)` is HUGEINT — cast both).
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
        sum(gf.fixed($"l_quantity", 100.0)).as("qty_f"),
        sum(gf.fixed($"l_extendedprice", 100.0)).as("price_f"),
        sum(gf.fixed($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000.0))
          .as("disc_price_f"),
        sum(gf.fixed($"l_discount", 100.0)).as("disc_f"),
        count(lit(1)).as("count_order"))
      .select(
        $"l_returnflag", $"l_linestatus",
        gf.dround(gf.sumFromFixed($"qty_f", 100.0), 2).as("sum_qty"),
        gf.dround(gf.sumFromFixed($"price_f", 100.0), 2).as("sum_base_price"),
        gf.dround(gf.sumFromFixed($"disc_price_f", 10000.0), 2).as("sum_disc_price"),
        gf.dround(gf.meanFromFixed($"qty_f", $"count_order", 100.0), 2).as("avg_qty"),
        gf.dround(gf.meanFromFixed($"disc_f", $"count_order", 100.0), 4).as("avg_disc"),
        $"count_order")
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """WITH a AS (
        |  SELECT l_returnflag, l_linestatus,
        |    sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS qty_f,
        |    sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS price_f,
        |    sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 10000.0 + 0.5) AS BIGINT)) AS disc_price_f,
        |    sum(CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS disc_f,
        |    count(*) AS count_order
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus,
        |  round(CAST(qty_f AS DOUBLE) / 100.0, 2) AS sum_qty,
        |  round(CAST(price_f AS DOUBLE) / 100.0, 2) AS sum_base_price,
        |  round(CAST(disc_price_f AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
        |  round(CAST(qty_f AS DOUBLE) / count_order / 100.0, 2) AS avg_qty,
        |  round(CAST(disc_f AS DOUBLE) / count_order / 100.0, 4) AS avg_disc,
        |  count_order
        |FROM a
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
