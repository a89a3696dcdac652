package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.{Frequency, Hll, TextOps}
import graft.sources.Tables

/** Cardinality / frequency sketch queries (h-series + the c05 corpus
  * heavy-hitters pass). Both follow the repo rule that sketch math must
  * be deterministic enough to ORACLE: the HLL estimate is an exact
  * integer harmonic sum folded through a fixed IEEE expression, and the
  * heavy-hitter output is exact by construction (Misra-Gries only
  * GENERATES candidates; the integer recount DECIDES).
  */
object SketchQueries {

  /** h01 — approximate distinct customers per order priority via
    * [[Hll]] (m=256 registers), next to the exact count and the
    * realized relative error. Two bounded-shuffle aggregations at any
    * scale vs countDistinct's full key shuffle — the 100 TB trade this
    * sketch exists for, with the exact column demonstrating the
    * accuracy envelope (|rel_err| ≲ 2σ ≈ 13%).
    */
  def h01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.load(spark, dir, "orders")
      .select($"o_orderpriority".as("prio"), $"o_custkey")
    val est = Hll.estimate(Hll.registers(o, $"o_custkey", Seq($"prio")), Seq($"prio"))
    val exact = o.groupBy($"prio").agg(countDistinct($"o_custkey").as("n_exact"))
    est.join(exact, Seq("prio"))
      .select($"prio", $"n_exact",
        gf.dround($"hll_estimate", 2).as("hll_estimate"),
        gf.dround(($"hll_estimate" - $"n_exact") / $"n_exact", 4).as("rel_err"),
        $"n_registers_hit")
      .orderBy($"prio")
  }

  /** c05 — exact corpus heavy hitters: every token above 0.5% of all
    * token occurrences (k=200), via [[Frequency.heavyHitters]] —
    * per-partition Misra-Gries candidates, exact integer-threshold
    * recount. Output is partition-invariant and exactly the SQL
    * HAVING-clause answer, with none of the full-vocabulary shuffle.
    */
  def c05(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(TextOps.tokens(TextOps.normalize($"text"))).as("token"))
    Frequency.heavyHitters(toks, "token", 200)
      .withColumnRenamed("item", "token")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h01_hll_distinct" -> h01,
    "c05_heavy_hitters" -> c05
  )

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  val oracles: Map[String, String] = Map(
    "h01_hll_distinct" -> DuckSketchSql.h01,
    "c05_heavy_hitters" ->
      s"""WITH n AS (SELECT $normSql AS norm FROM documents),
         |tok AS (SELECT unnest(string_split(norm, ' ')) AS token FROM n),
         |tot AS (SELECT count(*) AS n_total FROM tok),
         |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
         |SELECT c.token, c.cnt, tot.n_total
         |FROM c, tot WHERE c.cnt * 200 > tot.n_total
         |ORDER BY cnt DESC, token""".stripMargin
  )
}
