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

  /** z02 — Hilbert-curve locality audit over the same (l_partkey,
    * l_suppkey) plane as z01, so the two curves' bucket rectangles are
    * directly comparable. The 16 rotate-and-accumulate levels run as
    * ONE native codegen'd expression per row ([[graft.functions.HilbertD2Expr]]);
    * the oracle unrolls the identical 16 levels as chained CTEs
    * carrying (x, y, d).
    */
  def z02(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeExprs.ensureRegistered(spark)
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    Layout.hilbertStats(l, "l_partkey", "l_suppkey", bucketBits = 5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z01_zorder_layout" -> z01,
    "z02_hilbert_layout" -> z02,
    "b01_bloom_prune" -> b01
  )

  /** One Hilbert level (s = 2^(15−i)): the xy2d rotate-and-accumulate
    * step on the previous stage's (x, y, d) columns — linear SQL text,
    * each stage referencing the previous CTE once.
    */
  private def hilbertLevel(i: Int, prev: String): String = {
    val s = 1L << (15 - i)
    s"""hb$i AS (SELECT l_partkey, l_suppkey,
       |  CASE WHEN (y & $s) = 0
       |       THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END)
       |       ELSE x END AS x,
       |  CASE WHEN (y & $s) = 0
       |       THEN (CASE WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END)
       |       ELSE y END AS y,
       |  d + ${s * s}::BIGINT * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
       |                     (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END))::BIGINT AS d
       |  FROM $prev)""".stripMargin
  }

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
    "z02_hilbert_layout" -> {
      val levels = (0 to 15).map(i =>
        hilbertLevel(i, if (i == 0) "s0" else s"hb${i - 1}")).mkString(",\n")
      s"""WITH dom AS (SELECT min(l_partkey) AS xlo, max(l_partkey) AS xhi,
         |         min(l_suppkey) AS ylo, max(l_suppkey) AS yhi FROM lineitem),
         |s0 AS (SELECT
         |         (CASE WHEN xhi = xlo THEN 0
         |               ELSE ((l_partkey - xlo) * 65535) // (xhi - xlo) END) & 65535 AS x,
         |         (CASE WHEN yhi = ylo THEN 0
         |               ELSE ((l_suppkey - ylo) * 65535) // (yhi - ylo) END) & 65535 AS y,
         |         0::BIGINT AS d, l_partkey, l_suppkey FROM lineitem, dom),
         |$levels
         |SELECT d // 134217728 AS bucket, count(*) AS n_rows,
         |  min(l_partkey) AS x_min, max(l_partkey) AS x_max,
         |  min(l_suppkey) AS y_min, max(l_suppkey) AS y_max,
         |  min(d) AS h_min, max(d) AS h_max
         |FROM hb15 GROUP BY 1 ORDER BY bucket""".stripMargin
    },
    "b01_bloom_prune" -> DuckSketchSql.b01
  )
}
