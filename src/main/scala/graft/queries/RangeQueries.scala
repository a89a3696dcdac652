package graft.queries

import graft.QueryCaches.CacheOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.RangeJoin
import graft.sources.Tables

/** Range-join queries: the beyond-reference join family (SURVEY §7.5 —
  * as-of's sibling). Both run through [[graft.operators.RangeJoin]]'s
  * binned equi-join so the physical plan is a hash join on the bin key,
  * never a BroadcastNestedLoopJoin — and both are driver-checked against
  * DuckDB oracles that use the NAIVE theta-join formulation, proving the
  * binning is a pure execution strategy with zero semantic drift.
  */
object RangeQueries {

  /** r01 — point-in-interval range join: match each lineitem's unit
    * price (extendedprice/quantity, exact IEEE division on both
    * engines) into every part whose ±1.0 retail-price band contains it,
    * then aggregate per part. Unkeyed: at 100 TB the naive predicate is
    * an O(|L|·|P|) nested loop; binned it is one shuffle on the 2.0-wide
    * price bin.
    */
  def r01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = Tables.load(spark, dir, "lineitem")
      .select(($"l_extendedprice" / $"l_quantity").as("up"), $"l_quantity")
    val iv = Tables.load(spark, dir, "part")
      .select($"p_partkey", ($"p_retailprice" - 1.0).as("lo"),
        ($"p_retailprice" + 1.0).as("hi"))
    RangeJoin.pointInInterval(pts, "up", iv, "lo", "hi", binWidth = 2.0)
      .groupBy($"p_partkey")
      .agg(count(lit(1)).as("n_matches"),
        sum(gf.fixed($"l_quantity", 100.0)).as("qty_f"),
        sum(gf.fixed($"up", 1000000.0)).as("up_f"))
      .select($"p_partkey", $"n_matches",
        gf.dround(gf.sumFromFixed($"qty_f", 100.0), 2).as("sum_qty"),
        gf.dround(gf.meanFromFixed($"up_f", $"n_matches", 1000000.0), 4)
          .as("avg_unit_price"))
      .orderBy($"p_partkey")
  }

  /** r02 — interval-overlap self-join: which user pairs were active at
    * the same time? Intervals are the 30-min-gap sessions of q29
    * (floored-epoch-second bounds, the mapping the q29 oracle already
    * pins); overlapping pairs come from [[RangeJoin.intervalOverlap]]
    * with 1-hour bins — each qualifying pair exactly once via the
    * first-overlapping-bin guard, no distinct(). The session frame
    * feeds BOTH self-join sides, so it is persisted (aliasing defeats
    * exchange reuse — the repo's self-join rule).
    */
  def r02(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[graft.model.Schemas.Event]
    val sess = graft.streaming.Sessionize.sessionizeBatch(ev, 30).toDF()
      .select($"user_id", unix_timestamp($"session_start").as("lo"),
        unix_timestamp($"session_end").as("hi"))
      .persistScoped()
    val a = sess.select($"user_id".as("user_a"), $"lo".as("a_lo"), $"hi".as("a_hi"))
    val b = sess.select($"user_id".as("user_b"), $"lo".as("b_lo"), $"hi".as("b_hi"))
    RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
        binWidth = 3600.0)
      .filter($"user_a" < $"user_b")
      .groupBy($"user_a", $"user_b")
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least($"a_hi", $"b_hi") - greatest($"a_lo", $"b_lo")).as("overlap_secs"))
      .orderBy($"user_a", $"user_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r01_price_band_join" -> r01,
    "r02_session_overlap" -> r02
  )

  val oracles: Map[String, String] = Map(
    // Naive theta-join formulation on purpose: proves the Spark-side
    // binning changes execution only, not results.
    "r01_price_band_join" ->
      """WITH pts AS (
        |  SELECT l_extendedprice / l_quantity AS up, l_quantity FROM lineitem),
        |j AS (
        |  SELECT p.p_partkey, pts.up, pts.l_quantity
        |  FROM part p JOIN pts
        |    ON pts.up >= p.p_retailprice - 1.0 AND pts.up <= p.p_retailprice + 1.0),
        |a AS (
        |  SELECT p_partkey, count(*) AS n_matches,
        |    sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS qty_f,
        |    sum(CAST(floor(up * 1000000.0 + 0.5) AS BIGINT)) AS up_f
        |  FROM j GROUP BY 1)
        |SELECT p_partkey, n_matches,
        |  round(CAST(qty_f AS DOUBLE) / 100.0, 2) AS sum_qty,
        |  round(CAST(up_f AS DOUBLE) / n_matches / 1000000.0, 4) AS avg_unit_price
        |FROM a ORDER BY p_partkey""".stripMargin,
    "r02_session_overlap" ->
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, value) AS prev
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev IS NULL
        |              OR epoch_ms(ts) - epoch_ms(prev) >= 30 * 60000 THEN 1
        |         ELSE 0 END AS brk
        |  FROM e),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |iv AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
        |    CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
        |  FROM g GROUP BY user_id, sid)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |  count(*) AS n_overlaps,
        |  CAST(sum(least(a.hi, b.hi) - greatest(a.lo, b.lo)) AS BIGINT) AS overlap_secs
        |FROM iv a JOIN iv b
        |  ON a.lo <= b.hi AND b.lo <= a.hi AND a.user_id < b.user_id
        |GROUP BY 1, 2 ORDER BY user_a, user_b""".stripMargin
  )
}
