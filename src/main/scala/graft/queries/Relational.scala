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

  /** q25 — the big fact-fact join: lineitem ⋈ orders ⋈ customer ⋈ nation
    * ⋈ region with a region filter (TPC-H Q5 shape). lineitem⋈orders is
    * a genuine shuffle join on o_orderkey (both sides large at scale);
    * AQE decides broadcast vs sort-merge for customer from runtime
    * stats, nation/region are broadcast. Revenue in exact cents.
    */
  def q25RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val o = Tables.load(spark, dir, "orders").select($"o_orderkey", $"o_custkey",
      year($"o_orderdate").as("year"))
    val c = Tables.load(spark, dir, "customer").select($"c_custkey", $"c_nationkey")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region").filter($"r_name".isin("ASIA", "EUROPE"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name", $"year")
      .agg(
        sum(gf.fixed($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000.0))
          .as("rev_f"),
        count(lit(1)).as("n_lineitems"))
      .select($"r_name", $"n_name", $"year",
        gf.dround(gf.sumFromFixed($"rev_f", 10000.0), 2).as("revenue"),
        $"n_lineitems")
      .orderBy($"r_name", $"n_name", $"year")
  }

  /** q26 — part-level margin (lineitem ⋈ part): second fact join keyed
    * differently (l_partkey), demonstrating the reuse of one scan for a
    * differently-keyed shuffle.
    */
  def q26PartMargin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = Tables.load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    val p = Tables.load(spark, dir, "part").select($"p_partkey", $"p_type", $"p_retailprice")
    l.join(p, $"l_partkey" === $"p_partkey")
      .groupBy($"p_type")
      .agg(
        sum(gf.fixed($"l_extendedprice", 100.0)).as("rev_f"),
        sum(gf.fixed($"l_quantity" * $"p_retailprice", 10000.0)).as("retail_f"),
        count(lit(1)).as("n_lineitems"))
      .select($"p_type",
        gf.dround(gf.sumFromFixed($"rev_f", 100.0), 2).as("revenue"),
        gf.dround(gf.sumFromFixed($"retail_f", 10000.0), 2).as("retail_value"),
        $"n_lineitems")
      .orderBy($"p_type")
  }

  /** q27 — ROLLUP + exact DISTINCT aggregates (beyond the reference's
    * operator set; standard OLAP surface). Subtotal rows are labeled
    * 'ALL' via coalesce so no sort key is null (Spark and DuckDB order
    * nulls differently).
    */
  def q27RollupDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n = Tables.load(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val r = Tables.load(spark, dir, "region")
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", year($"o_orderdate").as("year"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_customers"),
        sum(gf.fixed($"o_totalprice", 100.0)).as("rev_f"))
      .select(
        coalesce($"r_name", lit("ALL")).as("r_name"),
        coalesce($"year", lit(-1)).as("year"),
        $"n_orders", $"n_customers",
        gf.dround(gf.sumFromFixed($"rev_f", 100.0), 2).as("revenue"))
      .orderBy($"r_name", $"year")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q25_region_revenue" -> q25RegionRevenue,
    "q26_part_margin" -> q26PartMargin,
    "q27_rollup_distinct" -> q27RollupDistinct
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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q25_region_revenue" ->
      """SELECT r.r_name, n.n_name, CAST(year(o.o_orderdate) AS INT) AS year,
        |  round(CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name IN ('ASIA', 'EUROPE')
        |GROUP BY 1, 2, 3
        |ORDER BY r_name, n_name, year""".stripMargin,
    "q26_part_margin" ->
      """SELECT p.p_type,
        |  round(CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue,
        |  round(CAST(sum(CAST(floor((l.l_quantity * p.p_retailprice) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS retail_value,
        |  count(*) AS n_lineitems
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1
        |ORDER BY p_type""".stripMargin,
    "q27_rollup_distinct" ->
      """SELECT coalesce(r.r_name, 'ALL') AS r_name,
        |  coalesce(CAST(year(o.o_orderdate) AS INT), -1) AS year,
        |  count(*) AS n_orders,
        |  count(DISTINCT o.o_custkey) AS n_customers,
        |  round(CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r.r_name, year(o.o_orderdate))
        |ORDER BY r_name, year""".stripMargin
  )
}
