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

  /** q31 — CUBE + grouping_id (completes the grouping-sets surface next
    * to q27's ROLLUP). `grouping_id()` and DuckDB `GROUPING(a, b)` share
    * the SQL-standard bit order (leftmost column = MSB), so the id is
    * compared directly; null dims are labeled like q27 so no sort key
    * is null. One expand + one hash aggregate — the expand multiplies
    * rows by 4 BEFORE the shuffle, but partial aggregation collapses
    * them map-side, so shuffle volume stays |groups|-bounded at scale.
    */
  def q31CubeGrouping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n_items"),
        sum(gf.fixed($"l_quantity", 100.0)).as("qty_f"),
        grouping_id().as("gid"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("l_returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("l_linestatus"),
        $"gid".cast("int").as("gid"),
        $"n_items",
        gf.dround(gf.sumFromFixed($"qty_f", 100.0), 2).as("sum_qty"))
      .orderBy($"gid", $"l_returnflag", $"l_linestatus")
  }

  /** q32 — pivot with an EXPLICIT value list: per order-year, order
    * counts per priority as columns. Passing the values to `pivot`
    * matters at scale — without them Spark runs an extra distinct-scan
    * job over the fact table just to learn the column set. The pivot
    * compiles to a single conditional-aggregation pass (exactly the
    * CASE-WHEN oracle), not a per-value scan. Output names are
    * sanitized to parquet-safe identifiers.
    */
  def q32PivotPriorities(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val names = Seq("n_urgent", "n_high", "n_medium", "n_not_specified", "n_low")
    val piv = Tables.load(spark, dir, "orders")
      .groupBy(year($"o_orderdate").as("year"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
    prios.zip(names).foldLeft(piv) { case (df, (p, n)) =>
      df.withColumnRenamed(p, n)
    }.select($"year" +: names.map(n => coalesce(col(n), lit(0L)).as(n)): _*)
      .orderBy($"year")
  }

  /** q57 — `unpivot`/melt, the pivot inverse (wide→long reshaping,
    * Spark 3.4+ `Dataset.unpivot`): per-returnflag fixed-point sums of
    * four lineitem measures melted to (flag, measure, total_units)
    * rows. Unpivot is a zero-shuffle per-row expansion (each input row
    * emits |values| output rows — the plan is a single Expand over the
    * aggregated frame), so the reshape happens AFTER the aggregation
    * pinches the data down: melt-then-agg would ×4 the shuffled bytes
    * for the same answer. Monetary measures carry cents, rates carry
    * basis points ×100 — the unpivoted value column must be one type,
    * so everything rides the established fixed-point BIGINT lane.
    */
  def q57Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = Tables.load(spark, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        sum(gf.fixed($"l_quantity", 100.0)).as("qty"),
        sum(gf.fixed($"l_extendedprice", 100.0)).as("price"),
        sum(gf.fixed($"l_discount", 10000.0)).as("discount"),
        sum(gf.fixed($"l_tax", 10000.0)).as("tax"))
    wide.unpivot(
        Array($"l_returnflag"),
        Array($"qty", $"price", $"discount", $"tax"),
        "measure", "total_units")
      .orderBy($"l_returnflag", $"measure")
  }

  /** q33 — EXACT per-group percentiles (p50/p90/p99) by two-pass
    * distributed SELECTION ([[graft.operators.Hll.exactPercentilesSelect]]):
    * histogram pass locates each target rank's bin, then only the rows
    * in that bin (≈ n/1024 of the group) are ranked. A direct
    * rank/count window over `l_returnflag` would sort EVERY row inside
    * 3 giant partitions at 100 TB; selection makes the exact answer
    * scale. Index semantics are the repo's integer form — value at
    * ceil(p·n/100) computed as (n·p + 99) div 100, so both engines
    * select the identical element (the oracle keeps the direct window
    * formulation: two different algorithms, one hash-matched answer).
    * Prices are exact cents end-to-end; dround only re-renders /100.
    */
  def q33Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
    graft.operators.Hll.exactPercentilesSelect(li, Seq($"l_returnflag"),
        gf.fixed($"l_extendedprice", 100.0), bins = 1024, pcts = Seq(50, 90, 99))
      .select($"l_returnflag", $"n_items",
        gf.dround($"p50".cast("double") / 100.0, 2).as("p50_price"),
        gf.dround($"p90".cast("double") / 100.0, 2).as("p90_price"),
        gf.dround($"p99".cast("double") / 100.0, 2).as("p99_price"))
      .orderBy($"l_returnflag")
  }

  /** q35 — FULL OUTER join (completes the join-type surface: inner /
    * left / semi / anti / asof / range / stream-stream exist elsewhere):
    * urgent-order vs low-order counts per CUSTOMER — with ~2 of each
    * per customer, a sizable Poisson fraction has only one side at
    * every SF, so both null branches genuinely fire. Null-side keys
    * coalesce into the output key (no null sort keys — the q27 rule);
    * presence is made explicit so the oracle pins which side was
    * missing.
    */
  def q35FullOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
    def side(prio: String, n: String) =
      o.filter($"o_orderpriority" === prio)
        .groupBy($"o_custkey".as("custkey"))
        .agg(count(lit(1)).as(n))
    val u = side("1-URGENT", "n_urgent")
    val l = side("5-LOW", "n_low").withColumnRenamed("custkey", "custkey_l")
    u.join(l, $"custkey" === $"custkey_l", "full_outer")
      .select(
        coalesce($"custkey", $"custkey_l").as("custkey"),
        coalesce($"n_urgent", lit(0L)).as("n_urgent"),
        coalesce($"n_low", lit(0L)).as("n_low"),
        when($"custkey".isNull, "low_only")
          .when($"custkey_l".isNull, "urgent_only")
          .otherwise("both").as("presence"))
      .orderBy($"custkey")
  }

  /** q36 — set operators INTERSECT / EXCEPT (distinct set semantics on
    * both engines): customers active in both 1995 and 1996 but not in
    * 1997. Compiles to semi/anti-join shapes — key-only shuffles.
    */
  def q36SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
    def active(y: Int) =
      o.filter(year($"o_orderdate") === y).select($"o_custkey")
    active(1995).intersect(active(1996)).except(active(1997))
      .orderBy($"o_custkey")
  }

  /** q45 — the remaining analytic-window family in one query, per
    * nation over customers ordered by exact keys (c_acctbal,
    * c_custkey): percent_rank and cume_dist (both a single division of
    * two small exact integers — one correctly-rounded IEEE op each, so
    * bit-identical across engines with no dround), nth_value(3) and
    * first/last_value over the FULL frame (value window functions
    * default to an unbounded-preceding..current frame — the explicit
    * full frame is the part naive ports get wrong, and both engines
    * are pinned to it here). One sort-shuffle on the partition key.
    */
  def q45WindowFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal", $"c_custkey")
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
      .withColumn("pct_rank", percent_rank().over(ord))
      .withColumn("cume", cume_dist().over(ord))
      .withColumn("third_lowest_bal", nth_value($"c_acctbal", 3).over(full))
      .withColumn("nation_min_bal", first($"c_acctbal").over(full))
      .withColumn("nation_max_bal", last($"c_acctbal").over(full))
      .orderBy($"c_nationkey", $"c_acctbal", $"c_custkey")
  }

  /** q58 — RANGE frames over an event-time axis (the frame surface q45
    * left out): per-customer trailing-90-day order count and spend.
    * RANGE differs from ROWS exactly when the order key has ties — all
    * same-day orders share one frame, so the result is deterministic
    * with NO tiebreak on the frame key (ROWS would need one). The time
    * axis is an epoch-day integer (`datediff` from a fixed origin) so
    * the DataFrame-API `rangeBetween(-90, 0)` — which only accepts
    * numeric bounds — expresses the calendar interval exactly; one
    * sort-shuffle on o_custkey, sums over exact cents.
    */
  def q58RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(spark, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        datediff($"o_orderdate", lit("1992-01-01").cast("date")).as("day"),
        gf.fixed($"o_totalprice", 100).as("cents"))
    val w = Window.partitionBy($"o_custkey").orderBy($"day").rangeBetween(-90, 0)
    o.select($"o_custkey", $"o_orderkey", $"day",
        count(lit(1)).over(w).as("n_90d"),
        gf.dround(gf.sumFromFixed(sum($"cents").over(w), 100), 2).as("spend_90d"))
      .orderBy($"o_custkey", $"day", $"o_orderkey")
  }

  /** q59 — correlated subqueries through the `spark.sql` surface:
    * a correlated scalar aggregate (nation average balance, fixed-point
    * cents so the distributed sum is exact) both in SELECT and as a
    * comparison bound, plus correlated EXISTS / NOT EXISTS. Catalyst
    * decorrelates all three (RewriteCorrelatedScalarSubquery → join on
    * the grouped aggregate; [NOT] EXISTS → left-semi/anti join), so the
    * physical plan is three shuffle-free-able joins, not a per-row
    * nested loop — the property that makes correlated SQL usable at
    * scale. The mean is `(sum_cents / n) / 100` with pinned association
    * ([[gf.meanFromFixed]]); both engines then compare the same IEEE
    * doubles.
    */
  def q59Correlated(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
        |  (SELECT CAST(sum(CAST(floor(c2.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |     / count(*) / 100.0
        |   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg_bal
        |FROM customer c
        |WHERE c.c_acctbal >
        |    (SELECT CAST(sum(CAST(floor(c3.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |       / count(*) / 100.0
        |     FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderpriority = '5-LOW')
        |ORDER BY c.c_custkey""".stripMargin)
  }

  /** q63 — windowed DISTINCT aggregation (trailing-90-day distinct
    * customers per priority): Spark has no `count(DISTINCT)` window
    * function, so the idiom is `size(array_distinct(flatten(
    * collect_list(per-day sets))))` — and crucially the window runs
    * over the PER-DAY AGGREGATED table (one hash-agg collapses orders
    * to ≤ |days| rows per priority carrying their distinct-custkey
    * sets), not over raw orders — the c08 "window over the small
    * derived table" rule. The ORACLE uses DuckDB's native
    * `count(DISTINCT) OVER RANGE` on raw rows — two different
    * formulations, one hash. Scale note: at 100 TB the per-day sets
    * themselves get wide; the sketch path is h04's KMV union (exact
    * sets swap for mergeable sketches, same plan shape).
    */
  def q63WindowedDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(spark, dir, "orders")
      .select($"o_orderpriority".as("prio"),
        datediff($"o_orderdate", lit("1992-01-01").cast("date")).as("day"),
        $"o_custkey")
      .groupBy($"prio", $"day")
      .agg(collect_set($"o_custkey").as("cs"), count(lit(1)).as("n_day"))
    val w = Window.partitionBy($"prio").orderBy($"day").rangeBetween(-90, 0)
    daily.select($"prio", $"day",
        sum($"n_day").over(w).as("n_orders_90d"),
        size(array_distinct(flatten(collect_list($"cs").over(w))))
          .cast("long").as("n_cust_90d"))
      .orderBy($"prio", $"day")
  }

  /** q65 — RECURSIVE CTEs (new in Spark 4.0): hop distances along g03's
    * planted chains, with BOTH engines executing the SAME
    * `WITH RECURSIVE` text — Spark's recursive execution (UnionLoop
    * iterations) is the unit under test, arbitrated against DuckDB's.
    * The planted chains are DIRECTED and acyclic, so UNION ALL
    * recursion terminates naturally and visits each node exactly once
    * (on a cyclic graph this needs the g05 depth-bound-plus-min form).
    * 50 chains of ~10 hops: each recursive ITERATION is a sequential
    * micro-job, so depth (not node count) is the local-mode cost —
    * ~10 rounds keeps the row honest while still multi-hop.
    */
  def q65RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(recursiveChainSql)
  }

  private[queries] val recursiveChainSql: String =
    """WITH RECURSIVE
      |o AS (SELECT o_orderkey AS id FROM
      |        (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 500)),
      |c AS (SELECT id, id % 50 AS grp,
      |        lead(id) OVER (PARTITION BY id % 50 ORDER BY id) AS nxt
      |      FROM o),
      |e AS (SELECT id AS src, nxt AS dst FROM c WHERE nxt IS NOT NULL),
      |heads AS (SELECT min(id) AS id FROM c GROUP BY grp),
      |reach(id, hops) AS (
      |  SELECT id, 0 FROM heads
      |  UNION ALL
      |  SELECT e.dst, reach.hops + 1 FROM reach JOIN e ON reach.id = e.src)
      |SELECT id, CAST(hops AS INT) AS hops FROM reach ORDER BY id""".stripMargin

  /** q66 — SQL PIPE syntax (Spark 4.0's `|>` operators): the q26
    * margin aggregation restated as a linear pipeline — FROM …
    * |> WHERE |> EXTEND (computed fixed-point columns) |> AGGREGATE …
    * GROUP BY |> SELECT |> ORDER BY. Same fixed-point cents math; the
    * oracle is the classic-SQL formulation, so the pipe FRONTEND is
    * what the hash verifies.
    */
  def q66PipeSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """FROM lineitem
        ||> WHERE l_quantity >= 10
        ||> EXTEND CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c
        ||> EXTEND CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT) AS disc_bp
        ||> AGGREGATE count(*) AS n_items, sum(price_c) AS price_cents,
        |     sum(disc_bp) AS disc_bp_sum GROUP BY l_returnflag, l_linestatus
        ||> SELECT l_returnflag, l_linestatus, n_items, price_cents, disc_bp_sum
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** q67 — parameterized SQL (named parameter markers, the
    * injection-safe production calling convention): top-N customers of
    * one segment by exact balance cents, with BOTH the segment and N
    * arriving as `:params` through `spark.sql(text, args)` — never
    * string-spliced. The oracle inlines the same constants.
    */
  def q67ParamSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_mktsegment,
        |  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        |FROM customer
        |WHERE c_mktsegment = :segment AND c_acctbal > :minBal
        |ORDER BY bal_cents DESC, c_custkey
        |LIMIT :topN""".stripMargin,
      Map("segment" -> "BUILDING", "minBal" -> 0, "topN" -> 50))
  }

  /** q74 — LATERAL correlated subquery (the remaining correlated-SQL
    * surface next to q59): per-nation top-3 customers by exact balance
    * cents, the per-row-subquery formulation analysts write. BOTH
    * engines run the IDENTICAL SQL text; what the hash verifies on the
    * Spark side is the DECORRELATION — Catalyst rewrites the
    * correlated `ORDER BY … LIMIT 3` lateral into a window-rank over
    * one equi-join (no per-outer-row re-execution, no nested loop:
    * PlanAuditSpec's no-CartesianProduct sweep covers this row too), so
    * the lateral idiom is safe verbatim at warehouse scale.
    */
  def q74LateralTopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(lateralTopKSql)
  }

  private[queries] val lateralTopKSql: String =
    """SELECT n.n_name, t.c_name, t.bal_cents
      |FROM nation n, LATERAL (
      |  SELECT c_name, CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
      |  FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY bal_cents DESC, c_name
      |  LIMIT 3
      |) t
      |ORDER BY n.n_name, t.bal_cents DESC, t.c_name""".stripMargin

  /** q76 — SQL SCRIPTING (Spark 4.0 `BEGIN … END` compounds,
    * `spark.sql.scripting.enabled`): session variables, a scalar
    * `WHILE` loop (halve the corpus-total revenue until it fits a
    * threshold — exact integer halving, so every iteration is
    * replayable), and a final SELECT that mixes the loop's scalars into
    * a grouped aggregate. The script returns its LAST statement's
    * result. DuckDB has no procedural scripting, so the oracle replays
    * the loop as a recursive CTE over the same integer arithmetic —
    * procedural frontend, declarative twin, one hash.
    */
  def q76SqlScript(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    spark.sql(
      """BEGIN
        |  DECLARE total BIGINT;
        |  DECLARE x BIGINT;
        |  DECLARE rounds INT DEFAULT 0;
        |  SET total = (SELECT sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |               FROM orders);
        |  SET x = total;
        |  WHILE x > 1000000 DO
        |    SET x = x DIV 2;
        |    SET rounds = rounds + 1;
        |  END WHILE;
        |  SELECT o_orderpriority AS prio,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    total AS total_cents, x AS residual_cents, rounds
        |  FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority;
        |END""".stripMargin)
  }

  /** q77 — EXECUTE IMMEDIATE (Spark 4.0 dynamic SQL): the statement
    * text arrives as a string with `?` parameter markers bound via
    * `USING` — the generated-SQL calling convention (BI tools, query
    * builders) executed injection-safe, completing q67's param-marker
    * family. The oracle inlines the same constants into the inner SQL.
    */
  def q77ExecuteImmediate(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_cust,
        |     sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS bal_cents
        |   FROM customer WHERE c_nationkey < ? GROUP BY c_mktsegment
        |   ORDER BY c_mktsegment'
        |  USING 13""".stripMargin)
  }

  /** q79 — SQL-defined FUNCTIONS (Spark 4.0 `CREATE FUNCTION … RETURN`):
    * a scalar function (the repo's cents quantization as a named SQL
    * UDF) and a TABLE function (top-5 customers of a segment), invoked
    * once per market segment. The point a plan reader should take: SQL
    * UDFs are NOT black boxes — `ResolveSQLFunctions` inlines the
    * bodies into the plan, so each TVF call compiles to the same
    * TakeOrderedAndProject a hand-written top-5 would, and the scalar
    * stays codegen'd (nothing like a JVM/Python UDF boundary exists).
    * (A LATERAL-correlated TVF argument mis-resolves in Spark 4.1 —
    * returned rows from the wrong scope — so the per-segment calls are
    * spelled out; q74 covers correlated LATERAL via a subquery.)
    * Oracle: bodies inlined by hand into one DuckDB window query.
    */
  def q79SqlFunctions(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE)
        |RETURNS BIGINT RETURN CAST(floor(x * 100.0 + 0.5) AS BIGINT)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_segtop(seg STRING)
        |RETURNS TABLE(c_custkey BIGINT, bal_cents BIGINT)
        |RETURN SELECT c_custkey, graft_cents(c_acctbal) AS bal_cents
        |  FROM customer WHERE c_mktsegment = seg
        |  ORDER BY bal_cents DESC, c_custkey LIMIT 5""".stripMargin)
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    spark.sql(
      segs.map(s => s"SELECT '$s' AS seg, c_custkey, bal_cents FROM graft_segtop('$s')")
        .mkString("", "\nUNION ALL\n", "\nORDER BY seg, bal_cents DESC, c_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q74_lateral_topk" -> q74LateralTopK,
    "q76_sql_script" -> q76SqlScript,
    "q77_execute_immediate" -> q77ExecuteImmediate,
    "q79_sql_functions" -> q79SqlFunctions,
    "q58_range_frame" -> q58RangeFrame,
    "q59_correlated" -> q59Correlated,
    "q63_windowed_distinct" -> q63WindowedDistinct,
    "q65_recursive_cte" -> q65RecursiveCte,
    "q66_pipe_sql" -> q66PipeSql,
    "q67_param_sql" -> q67ParamSql,
    "q35_full_outer" -> q35FullOuter,
    "q36_setops" -> q36SetOps,
    "q45_window_family" -> q45WindowFamily,
    "q25_region_revenue" -> q25RegionRevenue,
    "q26_part_margin" -> q26PartMargin,
    "q27_rollup_distinct" -> q27RollupDistinct,
    "q31_cube_grouping" -> q31CubeGrouping,
    "q32_pivot_priorities" -> q32PivotPriorities,
    "q57_unpivot_measures" -> q57Unpivot,
    "q33_percentiles" -> q33Percentiles
  )

  val oracles: Map[String, String] = Map(
    "q74_lateral_topk" -> lateralTopKSql,
    "q79_sql_functions" ->
      """WITH ranked AS (
        |  SELECT c_mktsegment AS seg, c_custkey,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) DESC,
        |        c_custkey) AS rn
        |  FROM customer)
        |SELECT seg, c_custkey, bal_cents FROM ranked WHERE rn <= 5
        |ORDER BY seg, bal_cents DESC, c_custkey""".stripMargin,
    "q77_execute_immediate" ->
      """SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer WHERE c_nationkey < 13 GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q76_sql_script" ->
      """WITH RECURSIVE
        |tot AS (SELECT CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |          AS BIGINT) AS total FROM orders),
        |halv(x, rounds) AS (
        |  SELECT total, 0 FROM tot
        |  UNION ALL
        |  SELECT x // 2, rounds + 1 FROM halv WHERE x > 1000000
        |),
        |fin AS (SELECT x, rounds FROM halv ORDER BY rounds DESC LIMIT 1)
        |SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n_orders,
        |  (SELECT total FROM tot) AS total_cents,
        |  (SELECT x FROM fin) AS residual_cents,
        |  (SELECT CAST(rounds AS INT) FROM fin) AS rounds
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q58_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INT) AS day,
        |  count(*) OVER w AS n_90d,
        |  round(CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER w AS DOUBLE) / 100.0, 2) AS spend_90d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
        |  RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    // q65: the oracle is the IDENTICAL recursive SQL text
    "q65_recursive_cte" -> recursiveChainSql,
    "q66_pipe_sql" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS disc_bp_sum
        |FROM lineitem
        |WHERE l_quantity >= 10
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q67_param_sql" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
        |ORDER BY bal_cents DESC, c_custkey
        |LIMIT 50""".stripMargin,
    "q63_windowed_distinct" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INT) AS day,
        |    o_custkey
        |  FROM orders),
        |d AS (
        |  SELECT prio, day,
        |    CAST(count(*) OVER w90 AS BIGINT) AS n_orders_90d,
        |    CAST(count(DISTINCT o_custkey) OVER w90 AS BIGINT) AS n_cust_90d
        |  FROM o
        |  WINDOW w90 AS (PARTITION BY prio ORDER BY day
        |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW))
        |SELECT DISTINCT prio, day, n_orders_90d, n_cust_90d
        |FROM d ORDER BY prio, day""".stripMargin,
    "q59_correlated" ->
      """SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
        |  (SELECT CAST(sum(CAST(floor(c2.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |     / count(*) / 100.0
        |   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) AS nation_avg_bal
        |FROM customer c
        |WHERE c.c_acctbal >
        |    (SELECT CAST(sum(CAST(floor(c3.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |       / count(*) / 100.0
        |     FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
        |  AND EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey
        |                    AND o2.o_orderpriority = '5-LOW')
        |ORDER BY c.c_custkey""".stripMargin,
    "q45_window_family" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  nth_value(c_acctbal, 3) OVER wf AS third_lowest_bal,
        |  first_value(c_acctbal) OVER wf AS nation_min_bal,
        |  last_value(c_acctbal) OVER wf AS nation_max_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
        |  wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_nationkey, c_acctbal, c_custkey""".stripMargin,
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
        |ORDER BY r_name, year""".stripMargin,
    "q31_cube_grouping" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |  count(*) AS n_items,
        |  round(CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q32_pivot_priorities" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS year,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_not_specified,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
        |FROM orders
        |GROUP BY 1 ORDER BY year""".stripMargin,
    // q57: melt via UNION ALL over the same fixed-point sums — the
    // measure labels keep the mixed scales (cents vs bp×100) explicit
    "q57_unpivot_measures" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS qty,
        |    CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS price,
        |    CAST(sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS discount,
        |    CAST(sum(CAST(floor(l_tax * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS tax
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, total_units FROM (
        |  SELECT l_returnflag, 'qty' AS measure, qty AS total_units FROM w
        |  UNION ALL SELECT l_returnflag, 'price', price FROM w
        |  UNION ALL SELECT l_returnflag, 'discount', discount FROM w
        |  UNION ALL SELECT l_returnflag, 'tax', tax FROM w)
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q33_percentiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag, max(n) AS n_items,
        |  round(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN l_extendedprice END), 2) AS p50_price,
        |  round(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN l_extendedprice END), 2) AS p90_price,
        |  round(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN l_extendedprice END), 2) AS p99_price
        |FROM r GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q35_full_outer" ->
      """WITH u AS (SELECT o_custkey AS custkey, count(*) AS n_urgent
        |           FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |l AS (SELECT o_custkey AS custkey_l, count(*) AS n_low
        |      FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1)
        |SELECT coalesce(u.custkey, l.custkey_l) AS custkey,
        |  coalesce(u.n_urgent, 0) AS n_urgent,
        |  coalesce(l.n_low, 0) AS n_low,
        |  CASE WHEN u.custkey IS NULL THEN 'low_only'
        |       WHEN l.custkey_l IS NULL THEN 'urgent_only'
        |       ELSE 'both' END AS presence
        |FROM u FULL OUTER JOIN l ON u.custkey = l.custkey_l
        |ORDER BY custkey""".stripMargin,
    "q36_setops" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin
  )
}
