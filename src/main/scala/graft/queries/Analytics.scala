package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.WindowOps
import graft.sources.Tables

/** Analytical query battery mirroring the reference's ten batch questions
  * (ASVSP `src/queries/q01..q10*.sql`) on the TPC-H-ish testdata.
  *
  * Scale notes: nation (25 rows) is always `broadcast()`; customer is
  * left to AQE's auto-broadcast (it's a pruned 2-column projection well
  * under the 10 MB threshold at test SFs, and at cluster scale AQE
  * decides from runtime stats). Revenue aggregation is fixed-point
  * ([[gf.fixed]]) so every engine/partitioning yields identical bits.
  */
object Analytics {

  private def cents(c: Column) = gf.fixed(c, 100.0)

  /** orders ⋈ customer ⋈ nation with pruned join columns. */
  def ordersWithNation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n = Tables.load(spark, dir, "nation").select("n_nationkey", "n_name")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
  }

  private val onatCte =
    """onat AS (
      |  SELECT o.*, n.n_name
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey)""".stripMargin

  /** q02 — W1 rank per year + W2 lag of rank + P16 coalesce (ASVSP
    * `q01_state_ranking.sql`): nation revenue ranking per year with
    * year-over-year rank delta.
    */
  def q02YearlyRankLag(spark: SparkSession, dir: String): DataFrame = {
    val rev = ordersWithNation(spark, dir)
      .groupBy(col("n_name"), year(col("o_orderdate")).as("year"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_f"))
    val ranked = rev.withColumn("nation_rank",
      WindowOps.rankBy(Seq(col("year")), Seq(col("rev_f").desc)))
    ranked
      .withColumn("prev_rank",
        WindowOps.lagBy(col("nation_rank"), Seq(col("n_name")), Seq(col("year"))))
      .select(
        col("n_name"), col("year"),
        gf.dround(gf.sumFromFixed(col("rev_f"), 100.0), 2).as("revenue"),
        col("nation_rank"),
        col("prev_rank"),
        coalesce(col("prev_rank") - col("nation_rank"), lit(0)).as("rank_change"))
      .orderBy(col("year"), col("nation_rank"), col("n_name"))
  }

  /** q03 — J2 join against a top-N CTE + O2 ordered limit (ASVSP
    * `q03_top10_cumulative.sql`): per-year order detail for the 10
    * highest-revenue customers. The top-10 side is tiny → broadcast.
    */
  def q03TopNJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val top10 = o.groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("total_rev_f"))
      .orderBy(col("total_rev_f").desc, col("o_custkey"))
      .limit(10)
      .withColumnRenamed("o_custkey", "t_custkey") // dodge self-join ambiguity
    val c = Tables.load(spark, dir, "customer").select("c_custkey", "c_name")
    o.join(broadcast(top10), o("o_custkey") === col("t_custkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_name"), year(col("o_orderdate")).as("year"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("rev_f"),
        max(col("total_rev_f")).as("trf"))
      .select(
        col("c_name"), col("year"), col("n_orders"),
        gf.dround(gf.sumFromFixed(col("rev_f"), 100.0), 2).as("revenue"),
        gf.dround(gf.sumFromFixed(col("trf"), 100.0), 2).as("customer_total_revenue"))
      .orderBy(col("c_name"), col("year"))
  }

  /** q04 — A2 conditional-sum + A5 conditional AVG in one pass (ASVSP
    * `monthly_aggregation.py:32-37`, `q09:5-6`): high-value order share
    * and conditional average per priority. Guarded divisions (both
    * engines differ on x/0).
    */
  def q04ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val high = col("o_totalprice") > 300000.0
    o.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(high, 1).otherwise(0)).as("n_high"),
        sum(when(high, cents(col("o_totalprice")))).as("high_f"))
      .select(
        col("o_orderpriority"), col("n_orders"), col("n_high"),
        gf.dround(col("n_high") * 100.0 / col("n_orders"), 3).as("pct_high"),
        when(col("n_high") > 0,
          gf.dround(gf.meanFromFixed(col("high_f"), col("n_high"), 100.0), 2))
          .as("avg_high_value"))
      .orderBy(col("o_orderpriority"))
  }

  /** q05 — A8 two filtered-period aggregates joined (J3) + W11 dual
    * ranking (ASVSP `q08_covid_impact.sql`): 1997 vs 1998 average order
    * value per nation with growth/decline ranks. Global windows over the
    * 25-row aggregate are fine (post-aggregation); never do this on raw
    * data at scale.
    */
  def q05PeriodCompare(spark: SparkSession, dir: String): DataFrame = {
    val on = ordersWithNation(spark, dir).withColumn("y", year(col("o_orderdate")))
    // ONE conditionally-aggregated pass over the two periods instead of
    // two filtered scans + an inner join (guide §2.4: the join and the
    // second scan were pure overhead — the per-period sums are columns
    // of one group). The inner join kept only nations present in BOTH
    // years, so filter n97 > 0 AND n98 > 0 — identical rows out.
    val j = on.filter(col("y").isin(1997, 1998)).groupBy("n_name")
      .agg(
        sum(when(col("y") === 1997, cents(col("o_totalprice")))).as("s97"),
        count(when(col("y") === 1997, lit(1))).as("n97"),
        sum(when(col("y") === 1998, cents(col("o_totalprice")))).as("s98"),
        count(when(col("y") === 1998, lit(1))).as("n98"))
      .filter(col("n97") > 0 && col("n98") > 0)
      .withColumn("avg_1997", gf.meanFromFixed(col("s97"), col("n97"), 100.0))
      .withColumn("avg_1998", gf.meanFromFixed(col("s98"), col("n98"), 100.0))
      .withColumn("pct_change",
        (col("avg_1998") - col("avg_1997")) / col("avg_1997") * 100)
    WindowOps.dualRank(j, Seq.empty, col("pct_change"),
        bestCol = "rank_growth", worstCol = "rank_decline")
      .select(
        col("n_name"),
        gf.dround(col("avg_1997"), 2).as("avg_1997"),
        gf.dround(col("avg_1998"), 2).as("avg_1998"),
        gf.dround(col("pct_change"), 3).as("pct_change"),
        col("rank_growth"), col("rank_decline"))
      .orderBy(col("n_name"))
  }

  /** q06 — W9 30-row moving average crossing year boundaries, then W16
    * top-k by rank within (nation, year) (ASVSP `q06_moving_average.sql`
    * with its asymmetric partition keys preserved).
    */
  def q06MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = ordersWithNation(spark, dir)
      .groupBy(col("n_name"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_f"))
    val ma = daily.withColumn("ma30",
        WindowOps.movingMeanFixed(col("rev_f"), Seq(col("n_name")), Seq(col("d")),
          30, 100.0))
      .withColumn("year", year(col("d")))
    WindowOps.topKPerGroup(ma, Seq(col("n_name"), col("year")),
        Seq(col("ma30").desc, col("d")), 3)
      .select(
        col("n_name"), col("year"),
        date_format(col("d"), "yyyy-MM-dd").as("d"),
        gf.dround(col("ma30"), 2).as("ma30"),
        col("rnk"))
      .orderBy(col("n_name"), col("year"), col("rnk"))
  }

  /** q07 — W10 NTILE(4) quartiles over a total order + A6 regrouped
    * frequency (ASVSP `q07_quartile.sql`): quartile membership counts by
    * priority × year.
    */
  def q07Ntile(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val q = o.withColumn("quartile",
      ntile(4).over(Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
    q.groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("year"),
        col("quartile"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("rev_f"))
      .select(
        col("o_orderpriority"), col("year"), col("quartile"),
        col("n_orders"),
        gf.dround(gf.meanFromFixed(col("rev_f"), col("n_orders"), 100.0), 2)
          .as("avg_price"))
      .orderBy(col("o_orderpriority"), col("year"), col("quartile"))
  }

  /** q08 — W12 gaps-and-islands growth streaks + P20 composite key + A7
    * (ASVSP `q10_improvement_streaks.sql`): longest consecutive
    * month-over-month order-count growth streak per nation.
    */
  def q08Streaks(spark: SparkSession, dir: String): DataFrame = {
    val mc = ordersWithNation(spark, dir)
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      .agg(count(lit(1)).as("cnt"))
    val streaks = WindowOps.growthStreaks(mc, Seq(col("n_name")), col("ym"), col("cnt"))
    streaks
      .withColumn("rn", row_number().over(Window.partitionBy(col("n_name"))
        .orderBy(col("streak_len").desc, col("streak_start"))))
      .filter(col("rn") === 1)
      .select(col("n_name"), col("streak_len"), col("streak_start"))
      .orderBy(col("n_name"))
  }

  /** q61 — the regression-aggregate family (`regr_slope` /
    * `regr_intercept` / `regr_r2` / `corr`) computed the DETERMINISTIC
    * way: Spark's built-ins sum doubles in shuffle order (results drift
    * across parallelism and engines), so the query aggregates EXACT
    * integer moments instead — n, Σx, Σy, Σx², Σxy, Σy² over quantized
    * centi-units, summed as decimal(38,0) (HUGEINT in the oracle; Σy²
    * alone would overflow int64 at sf ≥ 0.1) — and derives
    *
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),
    *   intercept = (Σy − slope·Σx)/n,  r² = num²/(denx·deny)
    *
    * as a fixed chain of IEEE ops on the exact moments, identical
    * operand-for-operand in both engines. The ×100 quantization cancels
    * in slope/r² (both axes scaled); intercept unscales by /100. Same
    * map-side-combine shape as any hash aggregate — one narrow shuffle
    * of six moment columns per group, the 100 TB regression shape.
    */
  def q61Regression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = "decimal(38,0)"
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_returnflag",
        gf.fixed($"l_quantity", 100).as("x"),
        gf.fixed($"l_extendedprice", 100).as("y"))
    li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"x".cast(dec)).as("sx"), sum($"y".cast(dec)).as("sy"),
        sum(($"x" * $"x").cast(dec)).as("sxx"),
        sum(($"x" * $"y").cast(dec)).as("sxy"),
        sum(($"y".cast(dec) * $"y".cast(dec))).as("syy"))
      .select($"l_returnflag", $"n",
        ($"n".cast(dec) * $"sxy" - $"sx" * $"sy").as("num"),
        ($"n".cast(dec) * $"sxx" - $"sx" * $"sx").as("denx"),
        ($"n".cast(dec) * $"syy" - $"sy" * $"sy").as("deny"),
        $"sx", $"sy")
      .select($"l_returnflag", $"n",
        ($"num".cast("double") / $"denx".cast("double")).as("slope_raw"),
        $"num", $"denx", $"deny", $"sx", $"sy")
      .select($"l_returnflag", $"n",
        gf.dround($"slope_raw", 6).as("slope"),
        gf.dround(($"sy".cast("double") - $"slope_raw" * $"sx".cast("double"))
          / $"n".cast("double") / 100.0, 6).as("intercept"),
        gf.dround(($"num".cast("double") * $"num".cast("double"))
          / ($"denx".cast("double") * $"deny".cast("double")), 6).as("r2"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_regression" -> q61Regression,
    "q02_yearly_rank_lag" -> q02YearlyRankLag,
    "q03_topn_join" -> q03TopNJoin,
    "q04_conditional_agg" -> q04ConditionalAgg,
    "q05_period_compare" -> q05PeriodCompare,
    "q06_moving_avg" -> q06MovingAvg,
    "q07_ntile" -> q07Ntile,
    "q08_streaks" -> q08Streaks)

  private val centsSql = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    // q61: HUGEINT moments ≡ Spark decimal(38,0); the double chain is
    // operand-for-operand identical (cast → multiply/divide → dround)
    "q61_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS HUGEINT)) AS sx,
        |    sum(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS HUGEINT)) AS sy,
        |    sum(CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS HUGEINT)
        |      * CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS HUGEINT)) AS sxx,
        |    sum(CAST(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS HUGEINT)
        |      * CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS HUGEINT)) AS sxy,
        |    sum(CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS HUGEINT)
        |      * CAST(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS HUGEINT)) AS syy
        |  FROM lineitem GROUP BY 1),
        |d AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
        |    CAST(n AS HUGEINT) * sxx - sx * sx AS denx,
        |    CAST(n AS HUGEINT) * syy - sy * sy AS deny,
        |    sx, sy
        |  FROM m),
        |s AS (
        |  SELECT l_returnflag, n, num, denx, deny, sx, sy,
        |    CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) AS slope_raw
        |  FROM d)
        |SELECT l_returnflag, n,
        |  round(slope_raw, 6) AS slope,
        |  round((CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 100.0, 6) AS intercept,
        |  round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
        |    / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 6) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q02_yearly_rank_lag" ->
      s"""WITH $onatCte,
         |rev AS (
         |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS year,
         |         sum($centsSql) AS rev_f
         |  FROM onat GROUP BY 1, 2),
         |r AS (
         |  SELECT *, CAST(rank() OVER (PARTITION BY year ORDER BY rev_f DESC) AS INT)
         |         AS nation_rank
         |  FROM rev),
         |l AS (
         |  SELECT *, lag(nation_rank) OVER (PARTITION BY n_name ORDER BY year)
         |         AS prev_rank
         |  FROM r)
         |SELECT n_name, year,
         |  round(CAST(rev_f AS DOUBLE) / 100.0, 2) AS revenue,
         |  nation_rank, prev_rank,
         |  coalesce(prev_rank - nation_rank, 0) AS rank_change
         |FROM l ORDER BY year, nation_rank, n_name""".stripMargin,
    "q03_topn_join" ->
      s"""WITH top10 AS (
         |  SELECT o_custkey, sum($centsSql) AS total_rev_f
         |  FROM orders GROUP BY 1
         |  ORDER BY total_rev_f DESC, o_custkey LIMIT 10)
         |SELECT c.c_name, CAST(year(o.o_orderdate) AS INT) AS year,
         |  count(*) AS n_orders,
         |  round(CAST(sum($centsSql) AS DOUBLE) / 100.0, 2) AS revenue,
         |  round(CAST(max(t.total_rev_f) AS DOUBLE) / 100.0, 2) AS customer_total_revenue
         |FROM orders o
         |JOIN top10 t ON o.o_custkey = t.o_custkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY 1, 2 ORDER BY c_name, year""".stripMargin,
    "q04_conditional_agg" ->
      s"""WITH a AS (
         |  SELECT o_orderpriority, count(*) AS n_orders,
         |    CAST(sum(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_high,
         |    sum(CASE WHEN o_totalprice > 300000.0 THEN $centsSql END) AS high_f
         |  FROM orders GROUP BY 1)
         |SELECT o_orderpriority, n_orders, n_high,
         |  round(n_high * 100.0 / n_orders, 3) AS pct_high,
         |  CASE WHEN n_high > 0
         |    THEN round(CAST(high_f AS DOUBLE) / n_high / 100.0, 2) END
         |    AS avg_high_value
         |FROM a ORDER BY o_orderpriority""".stripMargin,
    "q05_period_compare" ->
      s"""WITH $onatCte,
         |p97 AS (
         |  SELECT n_name, sum($centsSql) AS s97, count(*) AS n97
         |  FROM onat WHERE year(o_orderdate) = 1997 GROUP BY 1),
         |p98 AS (
         |  SELECT n_name, sum($centsSql) AS s98, count(*) AS n98
         |  FROM onat WHERE year(o_orderdate) = 1998 GROUP BY 1),
         |j AS (
         |  SELECT p97.n_name,
         |    CAST(s97 AS DOUBLE) / n97 / 100.0 AS avg_1997,
         |    CAST(s98 AS DOUBLE) / n98 / 100.0 AS avg_1998
         |  FROM p97 JOIN p98 ON p97.n_name = p98.n_name),
         |k AS (
         |  SELECT *, (avg_1998 - avg_1997) / avg_1997 * 100 AS pct_change FROM j)
         |SELECT n_name,
         |  round(avg_1997, 2) AS avg_1997,
         |  round(avg_1998, 2) AS avg_1998,
         |  round(pct_change, 3) AS pct_change,
         |  CAST(rank() OVER (ORDER BY pct_change DESC) AS INT) AS rank_growth,
         |  CAST(rank() OVER (ORDER BY pct_change ASC) AS INT) AS rank_decline
         |FROM k ORDER BY n_name""".stripMargin,
    "q06_moving_avg" ->
      s"""WITH $onatCte,
         |daily AS (
         |  SELECT n_name, CAST(o_orderdate AS DATE) AS d, sum($centsSql) AS rev_f
         |  FROM onat GROUP BY 1, 2),
         |ma AS (
         |  SELECT n_name, d,
         |    CAST(sum(rev_f) OVER w AS DOUBLE) / count(*) OVER w / 100.0 AS ma30,
         |    CAST(year(d) AS INT) AS year
         |  FROM daily
         |  WINDOW w AS (PARTITION BY n_name ORDER BY d
         |               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
         |r AS (
         |  SELECT *, CAST(rank() OVER (PARTITION BY n_name, year
         |         ORDER BY ma30 DESC, d) AS INT) AS rnk
         |  FROM ma)
         |SELECT n_name, year, strftime(d, '%Y-%m-%d') AS d,
         |  round(ma30, 2) AS ma30, rnk
         |FROM r WHERE rnk <= 3
         |ORDER BY n_name, year, rnk""".stripMargin,
    "q07_ntile" ->
      s"""WITH q AS (
         |  SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS year,
         |    o_totalprice,
         |    CAST(ntile(4) OVER (PARTITION BY o_orderpriority
         |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS quartile
         |  FROM orders)
         |SELECT o_orderpriority, year, quartile, count(*) AS n_orders,
         |  round(CAST(sum($centsSql) AS DOUBLE) / count(*) / 100.0, 2) AS avg_price
         |FROM q GROUP BY 1, 2, 3
         |ORDER BY o_orderpriority, year, quartile""".stripMargin,
    "q08_streaks" ->
      s"""WITH $onatCte,
         |mc AS (
         |  SELECT n_name,
         |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
         |    count(*) AS cnt
         |  FROM onat GROUP BY 1, 2),
         |f AS (
         |  SELECT *, CASE WHEN cnt > lag(cnt) OVER (PARTITION BY n_name ORDER BY ym)
         |         THEN 1 ELSE 0 END AS improved
         |  FROM mc),
         |g AS (
         |  SELECT *, sum(CASE WHEN improved = 0 THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY n_name ORDER BY ym
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM f),
         |s AS (
         |  SELECT n_name, grp, count(*) AS streak_len, min(ym) AS streak_start
         |  FROM g WHERE improved = 1 GROUP BY 1, 2),
         |r AS (
         |  SELECT n_name, streak_len, streak_start,
         |    row_number() OVER (PARTITION BY n_name
         |      ORDER BY streak_len DESC, streak_start) AS rn
         |  FROM s)
         |SELECT n_name, streak_len, streak_start
         |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin)
}
