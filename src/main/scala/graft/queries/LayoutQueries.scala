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

  /** The z03 box predicate in QUANTIZED coordinates — planner
    * constants shared by the Spark query, the curve-range planning,
    * the oracle, and LayoutSpec. Spans quantized-grid cells
    * cx ∈ [0,2] × cy ∈ [1,2] at level 3 (cell side 8192): 6 of the 64
    * curve buckets.
    */
  val Z03Box = (4000L, 20000L, 9000L, 17000L)

  /** Per-sf lake root for z03's clustered table (the q46/q50 sf-keyed
    * path convention, derived directly from the sfDir — nothing cites
    * the path, it only needs to be collision-free across concurrent
    * runs at different sfs). */
  def z03Root(dir: String): String =
    s"/root/repo/target/z03_lake-${new java.io.File(dir).getName}"

  /** z03 — clustered WRITE + PRUNED READ: the thing a 100 TB lake user
    * actually does with the z01/z02 curve machinery. Writes lineitem
    * Hilbert-clustered — quantized (l_partkey, l_suppkey) → order-16
    * curve index `hv` → hive-partitioned by the level-3 curve bucket
    * (hv >> 26, 64 deterministic z-space cells), one file per bucket
    * (repartition on bucket), curve-ordered within files — then reads
    * it back under a tight quantized box predicate with the bucket
    * IN-list from [[Layout.hilbertBucketsForBox]] curve-range planning
    * (pure planner arithmetic, O(1) in data size). Partition pruning
    * skips the other ~58 directories entirely and the stored qx/qy
    * columns push down into the 6 read files; LayoutSpec asserts the
    * executed scan touched files_read < ⅓ of files_total and that the
    * box rows equal a straight unclustered scan (layout never changes
    * answers). Output: per read bucket, its full row count, in-box row
    * count and in-box price cents, plus the (files_total, files_read)
    * pruning facts — ALL data-derived, so the DuckDB oracle replicates
    * every value from raw lineitem including the corner-point curve
    * planning. Ref: SURVEY §4 partition pruning;
    * /root/reference/src/batch/load_hourly.py:100.
    */
  def z03(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeExprs.ensureRegistered(spark)
    val root = z03Root(dir)
    val (bx0, bx1, by0, by1) = Z03Box
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val dom = l.groupBy().agg(
      min(col("l_partkey")).as("_xlo"), max(col("l_partkey")).as("_xhi"),
      min(col("l_suppkey")).as("_ylo"), max(col("l_suppkey")).as("_yhi"))
    val clustered = l.crossJoin(broadcast(dom))
      .select(
        Layout.quantize16(col("l_partkey"), col("_xlo"), col("_xhi")).as("qx"),
        Layout.quantize16(col("l_suppkey"), col("_ylo"), col("_yhi")).as("qy"),
        gf.fixed(col("l_extendedprice"), 100.0).as("price_c"))
      .withColumn("hv", call_function("graft_hilbert_d2", col("qx"), col("qy")))
      .withColumn("bucket", shiftrightunsigned(col("hv"), 26))
    clustered.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("hv"))
      .write.mode("overwrite").partitionBy("bucket").parquet(root)
    // coalesced curve ranges, not a per-cell IN-list: identical row set
    // (LayoutSpec pins range-cover ≡ cell-list at every level), but the
    // predicate count scales with the box perimeter instead of its area
    // when the plan generalizes to fine levels
    val ranges = Layout.hilbertRangesForBox(bx0, bx1, by0, by1, levels = 3)
    val tbl = spark.read.parquet(root)
    val pruned = tbl.filter(Layout.rangesPredicate(col("bucket"), ranges))
    val inBox = col("qx").between(bx0, bx1) && col("qy").between(by0, by1)
    val totals = broadcast(tbl.groupBy()
      .agg(countDistinct(col("bucket")).as("files_total")))
    val readCnt = broadcast(pruned.groupBy()
      .agg(countDistinct(col("bucket")).as("files_read")))
    pruned.groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows_dir"),
        sum(inBox.cast("long")).as("n_rows_box"),
        sum(when(inBox, col("price_c")).otherwise(0L)).as("price_cents_box"))
      .crossJoin(totals)
      .crossJoin(readCnt)
      .orderBy(col("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "z01_zorder_layout" -> z01,
    "z02_hilbert_layout" -> z02,
    "z03_clustered_prune" -> z03,
    "b01_bloom_prune" -> b01
  )

  /** One Hilbert level (s = 2^(15−i)): the xy2d rotate-and-accumulate
    * step on the previous stage's (x, y, d) columns — linear SQL text,
    * each stage referencing the previous CTE once. `carry` columns
    * ride through untouched; `prefix` names the chain (two chains in
    * one statement — z03 — must not collide).
    */
  private def hilbertLevel(i: Int, prev: String, carry: Seq[String],
                           prefix: String): String = {
    val s = 1L << (15 - i)
    val keep = if (carry.isEmpty) "" else carry.mkString("", ", ", ",")
    s"""$prefix$i AS (SELECT $keep
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
        hilbertLevel(i, if (i == 0) "s0" else s"hb${i - 1}",
          Seq("l_partkey", "l_suppkey"), "hb")).mkString(",\n")
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
    "b01_bloom_prune" -> DuckSketchSql.b01,
    // z03: replicate the ENTIRE dataflow from raw lineitem — per-row
    // quantize + xy2d (the zl chain), the 6 corner-point xy2d's of the
    // curve-range planner (the cl chain over the box's grid cells),
    // then eligibility join + pruning facts. Two xy2d chains, one
    // statement, distinct prefixes; bk/pr are MATERIALIZED (2 refs
    // each — the g06 inlining rule).
    "z03_clustered_prune" -> {
      val (bx0, bx1, by0, by1) = Z03Box
      val dataLevels = (0 to 15).map(i =>
        hilbertLevel(i, if (i == 0) "s0" else s"zl${i - 1}",
          Seq("qx0", "qy0", "price_c"), "zl")).mkString(",\n")
      val cellLevels = (0 to 15).map(i =>
        hilbertLevel(i, if (i == 0) "cells" else s"cl${i - 1}",
          Seq.empty, "cl")).mkString(",\n")
      s"""WITH dom AS (SELECT min(l_partkey) AS xlo, max(l_partkey) AS xhi,
         |         min(l_suppkey) AS ylo, max(l_suppkey) AS yhi FROM lineitem),
         |s0 AS (SELECT
         |         (CASE WHEN xhi = xlo THEN 0
         |               ELSE ((l_partkey - xlo) * 65535) // (xhi - xlo) END) & 65535 AS x,
         |         (CASE WHEN yhi = ylo THEN 0
         |               ELSE ((l_suppkey - ylo) * 65535) // (yhi - ylo) END) & 65535 AS y,
         |         x AS qx0, y AS qy0,
         |         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c,
         |         0::BIGINT AS d
         |       FROM lineitem, dom),
         |$dataLevels,
         |cg AS (SELECT unnest(range(${bx0 / 8192}, ${bx1 / 8192 + 1}, 1)) AS cx),
         |ch AS (SELECT unnest(range(${by0 / 8192}, ${by1 / 8192 + 1}, 1)) AS cy),
         |cells AS (SELECT cx * 8192 AS x, cy * 8192 AS y, 0::BIGINT AS d
         |          FROM cg, ch),
         |$cellLevels,
         |elig AS (SELECT DISTINCT d // 67108864 AS bucket FROM cl15),
         |bk AS MATERIALIZED (SELECT qx0, qy0, price_c,
         |        d // 67108864 AS bucket FROM zl15),
         |ft AS (SELECT count(DISTINCT bucket) AS files_total FROM bk),
         |pr AS MATERIALIZED (SELECT bk.* FROM bk
         |        JOIN elig ON bk.bucket = elig.bucket),
         |fr AS (SELECT count(DISTINCT bucket) AS files_read FROM pr)
         |SELECT pr.bucket AS bucket, count(*) AS n_rows_dir,
         |  CAST(sum(CASE WHEN qx0 BETWEEN $bx0 AND $bx1
         |                 AND qy0 BETWEEN $by0 AND $by1
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_box,
         |  CAST(sum(CASE WHEN qx0 BETWEEN $bx0 AND $bx1
         |                 AND qy0 BETWEEN $by0 AND $by1
         |                THEN price_c ELSE 0 END) AS BIGINT) AS price_cents_box,
         |  ft.files_total, fr.files_read
         |FROM pr, ft, fr
         |GROUP BY pr.bucket, ft.files_total, fr.files_read
         |ORDER BY bucket""".stripMargin
    }
  )
}
