package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Spark-SQL twins of representative DataFrame queries (SURVEY.md §7.1:
  * each query as BOTH a SQL string and a DataFrame implementation,
  * hash-matched against each other; §2.1 S10: the `spark.sql` entry
  * point). The twins run over [[Tables.registerAll]] temp views and are
  * asserted row-identical to their DataFrame counterparts in
  * SqlTwinsSpec — proving the engine's surface is reachable from pure
  * SQL text exactly like the reference's Hue/SQL-file path.
  */
object SqlTwins {

  def run(spark: SparkSession, dir: String, name: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(sql(name))
  }

  val sql: Map[String, String] = Map(
    "q43_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
        |  WHERE e.event_type = 'view' GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s4 AS (
        |  SELECT e.user_id, min(e.ts) AS t4 FROM events e
        |  JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t3
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT s1.user_id,
        |  unix_micros(t1) AS signup_us,
        |  unix_micros(t2) AS view_us,
        |  unix_micros(t3) AS click_us,
        |  unix_micros(t4) AS purchase_us
        |FROM s1
        |LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |LEFT JOIN s4 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q44_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day FROM events),
        |sz AS (
        |  SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1),
        |m AS (
        |  SELECT cohort_day, activity_day, count(*) AS n_users
        |  FROM f JOIN a USING (user_id) GROUP BY 1, 2)
        |SELECT m.cohort_day, m.activity_day, n_users, cohort_size,
        |  CAST(signum(100.0D * n_users / cohort_size)
        |    * floor(abs(100.0D * n_users / cohort_size) * 100.0 + 0.5D)
        |    / 100.0 AS DOUBLE) AS retention_pct
        |FROM m JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, activity_day""".stripMargin,
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
        |    sum(CAST(floor(l_quantity * 100.0 + 0.5D) AS LONG)) AS qty_f,
        |    sum(CAST(floor(l_extendedprice * 100.0 + 0.5D) AS LONG)) AS price_f,
        |    sum(CAST(floor((l_extendedprice * (1.0D - l_discount)) * 10000.0 + 0.5D) AS LONG)) AS disc_price_f,
        |    sum(CAST(floor(l_discount * 100.0 + 0.5D) AS LONG)) AS disc_f,
        |    count(*) AS count_order
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(signum(qty_f) * floor(abs(CAST(qty_f AS DOUBLE) / 100.0) * 100.0 + 0.5D) / 100.0 AS DOUBLE) AS sum_qty,
        |  CAST(signum(price_f) * floor(abs(CAST(price_f AS DOUBLE) / 100.0) * 100.0 + 0.5D) / 100.0 AS DOUBLE) AS sum_base_price,
        |  CAST(signum(disc_price_f) * floor(abs(CAST(disc_price_f AS DOUBLE) / 10000.0) * 100.0 + 0.5D) / 100.0 AS DOUBLE) AS sum_disc_price,
        |  CAST(signum(qty_f) * floor(abs(CAST(qty_f AS DOUBLE) / count_order / 100.0) * 100.0 + 0.5D) / 100.0 AS DOUBLE) AS avg_qty,
        |  CAST(signum(disc_f) * floor(abs(CAST(disc_f AS DOUBLE) / count_order / 100.0) * 10000.0 + 0.5D) / 10000.0 AS DOUBLE) AS avg_disc,
        |  count_order
        |FROM a
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q08_streaks" ->
      """WITH onat AS (
        |  SELECT o.*, n.n_name
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |mc AS (
        |  SELECT n_name, year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |         count(*) AS cnt
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
        |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin,
    "q31_cube_grouping" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
        |  count(*) AS n_items,
        |  CAST(signum(sum(CAST(floor(l_quantity * 100.0 + 0.5D) AS LONG)))
        |    * floor(abs(CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5D) AS LONG)) AS DOUBLE) / 100.0) * 100.0 + 0.5D)
        |    / 100.0 AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q33_percentiles" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag, max(n) AS n_items,
        |  CAST(signum(max(CASE WHEN rn = CAST(floor((n * 50 + 99) / 100) AS LONG) THEN l_extendedprice END))
        |    * floor(abs(max(CASE WHEN rn = CAST(floor((n * 50 + 99) / 100) AS LONG) THEN l_extendedprice END)) * 100.0 + 0.5D) / 100.0 AS DOUBLE) AS p50_price,
        |  CAST(signum(max(CASE WHEN rn = CAST(floor((n * 90 + 99) / 100) AS LONG) THEN l_extendedprice END))
        |    * floor(abs(max(CASE WHEN rn = CAST(floor((n * 90 + 99) / 100) AS LONG) THEN l_extendedprice END)) * 100.0 + 0.5D) / 100.0 AS DOUBLE) AS p90_price,
        |  CAST(signum(max(CASE WHEN rn = CAST(floor((n * 99 + 99) / 100) AS LONG) THEN l_extendedprice END))
        |    * floor(abs(max(CASE WHEN rn = CAST(floor((n * 99 + 99) / 100) AS LONG) THEN l_extendedprice END)) * 100.0 + 0.5D) / 100.0 AS DOUBLE) AS p99_price
        |FROM r GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q36_setops" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_custkey""".stripMargin)
}
