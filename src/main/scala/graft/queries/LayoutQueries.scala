package graft.queries

import graft.QueryCaches.CacheOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf
import graft.operators.{BloomPrune, Layout}
import graft.sources.Tables

/** Physical-layout and scan-pruning queries: Z-order clustering audit
  * (z01) and Bloom-filter join pruning (b01) — the two classic levers
  * for cutting I/O and shuffle volume at 100 TB, expressed as exact,
  * oracle-checkable dataflows.
  */
object LayoutQueries {

  /** z01 — Z-order locality audit over (l_partkey, l_suppkey): Morton
    * codes, fixed 32-way z-space buckets, per-bucket dim rectangles.
    * The narrow x/y ranges per bucket ARE the demonstration that a
    * z-sorted layout gives parquet min/max skipping on both join keys
    * at once (a single-column sort gives one). Pure long arithmetic —
    * bit-identical in the DuckDB oracle.
    */
  def z01(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    Layout.zorderStats(l, "l_partkey", "l_suppkey", bucketBits = 5)
  }

  /** b01 — Bloom-pruned fact⋈dim: customers of one nation (selective
    * dim) filter orders (fact) through a 2^16-bit deterministic Bloom
    * filter BEFORE the exact semi-join; the output reconciles, per
    * year, the Bloom-passed count vs the exact match count — so the
    * realized false-positive count is itself an asserted, reproducible
    * fact. Revenue comes only from exact matches (pruning can never
    * change answers).
    */
  def b01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.load(spark, dir, "customer")
      .filter($"c_nationkey" === 5).select($"c_custkey")
    val orders = Tables.load(spark, dir, "orders")
    val bloom = BloomPrune.build(cust, "c_custkey")
    val passed = BloomPrune.prune(orders, "o_custkey", bloom)
      .withColumn("year", year($"o_orderdate").cast("int"))
      .persistScoped() // both the pass-count and the exact branch read it
    val passAgg = passed.groupBy($"year").agg(count(lit(1)).as("n_bloom_pass"))
    val exact = passed
      .join(broadcast(cust), $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"year")
      .agg(count(lit(1)).as("n_orders"),
        sum(gf.fixed($"o_totalprice", 100.0)).as("rev_f"))
    passAgg.join(exact, Seq("year"), "left")
      .select($"year",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce(gf.dround(gf.sumFromFixed($"rev_f", 100.0), 2), lit(0.0d)).as("revenue"),
        $"n_bloom_pass",
        ($"n_bloom_pass" - coalesce($"n_orders", lit(0L))).as("n_false_pos"))
      .orderBy($"year")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z01_zorder_layout" -> z01,
    "b01_bloom_prune" -> b01
  )

  val oracles: Map[String, String] = Map(
    "z01_zorder_layout" ->
      """WITH dom AS (SELECT min(l_partkey) AS xlo, max(l_partkey) AS xhi,
        |         min(l_suppkey) AS ylo, max(l_suppkey) AS yhi FROM lineitem),
        |s0 AS (SELECT
        |         (CASE WHEN xhi = xlo THEN 0
        |               ELSE ((l_partkey - xlo) * 65535) // (xhi - xlo) END) & 65535 AS x,
        |         (CASE WHEN yhi = ylo THEN 0
        |               ELSE ((l_suppkey - ylo) * 65535) // (yhi - ylo) END) & 65535 AS y,
        |         l_partkey, l_suppkey FROM lineitem, dom),
        |s1 AS (SELECT *, (x | (x << 8)) & 16711935 AS x1,
        |         (y | (y << 8)) & 16711935 AS y1 FROM s0),
        |s2 AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
        |         (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
        |         (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT *, (x3 | (x3 << 1)) & 1431655765 AS x4,
        |         (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3),
        |z AS (SELECT l_partkey, l_suppkey, x4 | (y4 << 1) AS zv FROM s4)
        |SELECT zv // 134217728 AS bucket, count(*) AS n_rows,
        |  min(l_partkey) AS x_min, max(l_partkey) AS x_max,
        |  min(l_suppkey) AS y_min, max(l_suppkey) AS y_max,
        |  min(zv) AS z_min, max(zv) AS z_max
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    "b01_bloom_prune" -> DuckSketchSql.b01
  )
}
