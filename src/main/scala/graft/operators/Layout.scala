package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-column
  * data skipping.
  *
  * Why this exists at 100 TB: parquet readers prune files/row-groups by
  * min/max column stats. Sorting by a single column gives tight stats
  * on that column only; interleaving the bits of TWO filter columns
  * (the Z-order curve) gives every file a small rectangle in both
  * dimensions, so point/range predicates on EITHER column skip most
  * files. The production write path is
  * `df.repartitionByRange(n, zv).sortWithinPartitions(zv).write...` —
  * range-partition boundaries are sampled (not reproducible), which is
  * fine for a LAYOUT (it never changes query answers). The z-value
  * itself and the bucket-locality audit below are exact and
  * engine-portable.
  */
object Layout {

  /** 32-bit Morton code of two 16-bit dims via the classic
    * mask-spread (Bit Twiddling Hacks "Interleave bits by Binary Magic
    * Numbers") — 4 shift/mask rounds per dim, pure long arithmetic,
    * identical in DuckDB. Inputs are masked to 16 bits; use
    * [[quantize16]] to map an arbitrary integer domain onto the full
    * 16-bit space first (raw low-bit keys would otherwise collapse
    * into one z-range corner).
    */
  def zValue(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      val c0 = c.bitwiseAND(lit(0xFFFFL))
      val c1 = c0.bitwiseOR(shiftleft(c0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val c2 = c1.bitwiseOR(shiftleft(c1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val c3 = c2.bitwiseOR(shiftleft(c2, 2)).bitwiseAND(lit(0x33333333L))
      c3.bitwiseOR(shiftleft(c3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Affine-quantize an integer column onto [0, 65535] from its
    * observed [lo, hi] — EXACT integer arithmetic ((x−lo)·65535 div
    * (hi−lo)), so both engines bucket identically; constant domain
    * (hi = lo) maps to 0. `lo`/`hi` come from a 1-row aggregate
    * broadcast-crossed onto the data (no collect, no sampled
    * boundaries — reproducible at any parallelism, unlike
    * `repartitionByRange`'s sampler).
    */
  def quantize16(x: Column, lo: Column, hi: Column): Column = {
    // (x−lo)·65535 overflows Long once the column span exceeds ~1.4e14
    // (nano/micro-timestamp keys), and a wrapped product breaks Morton
    // MONOTONICITY — curve pruning would then skip files that contain
    // matching rows. Wide spans therefore take exact DECIMAL(38,0)
    // arithmetic (the widest case, 1.8e19 span × 65535 ≈ 1.2e24, fits
    // 25 digits; IntegralDivide on decimals still returns BIGINT). But
    // decimal at this precision is BigDecimal-backed and ~2.5× slower
    // per row (z01/z02 bench), so the common narrow-span case keeps
    // the pure-long path behind a runtime guard: span ≥ 0 rejects a
    // WRAPPED hi−lo (true span past Long.MaxValue), span ≤ MaxValue/
    // 65535 keeps the product in range, and x ∈ [lo,hi] (lo/hi are
    // x's observed extremes) bounds x−lo by the span. Both branches
    // are value-identical wherever the long path is exact.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val span = hi - lo
    val safeSpan = span >= lit(0L) && span <= lit(Long.MaxValue / 65535L)
    when(hi === lo, lit(0L))
      .otherwise(when(safeSpan,
        call_function("div", (x - lo) * lit(65535L), span))
        .otherwise(call_function("div",
          (x.cast(dec) - lo.cast(dec)) * lit(65535L),
          hi.cast(dec) - lo.cast(dec))))
  }

  /** Locality audit: bucket rows by the TOP `bucketBits` bits of their
    * z-value (fixed z-space splits — the deterministic analog of the
    * file boundaries a z-sorted write produces) and report each
    * bucket's row count and per-dimension min/max — the rectangle a
    * file written in this order would advertise in its parquet stats.
    * Narrow rectangles ⇒ effective skipping on both dims. No window, no
    * sort: two aggregates at any scale (domain min/max + the bucket
    * stats; a global ntile would collapse to a single task — the
    * anti-pattern).
    */
  def zorderStats(df: DataFrame, xCol: String, yCol: String,
                  bucketBits: Int): DataFrame = {
    val dom = df.groupBy().agg(
      min(col(xCol)).as("_xlo"), max(col(xCol)).as("_xhi"),
      min(col(yCol)).as("_ylo"), max(col(yCol)).as("_yhi"))
    val z = zValue(
      quantize16(col(xCol), col("_xlo"), col("_xhi")),
      quantize16(col(yCol), col("_ylo"), col("_yhi")))
    df.crossJoin(broadcast(dom))
      .withColumn("zv", z)
      .drop("_xlo", "_xhi", "_ylo", "_yhi")
      .withColumn("bucket", shiftrightunsigned(col("zv"), 32 - bucketBits))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"),
        min(col("zv")).as("z_min"), max(col("zv")).as("z_max"))
      .orderBy(col("bucket"))
  }

  /** Hilbert-curve locality audit — [[zorderStats]]'s shape with the
    * order-16 Hilbert index (`graft_hilbert_d2`, a native codegen'd
    * expression) in place of the Morton code. Why offer both: Hilbert
    * preserves adjacency strictly better than Z-order (every
    * consecutive pair of curve cells is grid-adjacent — no Z-shape
    * "jumps" across the plane), so file rectangles are tighter on
    * average at the same bucket count; Morton stays cheaper to compute
    * and prefix-prunable by bit arithmetic. Same two-aggregate plan,
    * same exact integer math, same 32-bit curve domain.
    */
  def hilbertStats(df: DataFrame, xCol: String, yCol: String,
                   bucketBits: Int): DataFrame = {
    val dom = df.groupBy().agg(
      min(col(xCol)).as("_xlo"), max(col(xCol)).as("_xhi"),
      min(col(yCol)).as("_ylo"), max(col(yCol)).as("_yhi"))
    val hv = call_function("graft_hilbert_d2",
      quantize16(col(xCol), col("_xlo"), col("_xhi")),
      quantize16(col(yCol), col("_ylo"), col("_yhi")))
    df.crossJoin(broadcast(dom))
      .withColumn("hv", hv)
      .drop("_xlo", "_xhi", "_ylo", "_yhi")
      .withColumn("bucket", shiftrightunsigned(col("hv"), 32 - bucketBits))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"),
        min(col("hv")).as("h_min"), max(col("hv")).as("h_max"))
      .orderBy(col("bucket"))
  }

  /** Driver-side mirror of `graft_hilbert_d2`
    * ([[graft.functions.HilbertD2Expr]]): the order-16 xy2d
    * rotate-and-accumulate loop on two 16-bit coordinates. This runs on
    * PLANNER CONSTANTS only (bucket-corner points when translating a
    * box predicate into curve ranges — [[hilbertBucketsForBox]]), never
    * per row; LayoutSpec pins it value-for-value against the native
    * expression so the planner and the data path can never disagree.
    */
  /** Driver-side Morton interleave of two 16-bit values — the scalar
    * twin of [[zValue]] (same spread masks), for PLANNING arithmetic
    * over file-stat corners: Morton codes are monotone under
    * coordinate-wise dominance, so a file whose rectangle is
    * [xlo,xhi]×[ylo,yhi] has all its z-values inside
    * [zLong(xlo,ylo), zLong(xhi,yhi)] — the interval the incremental
    * `system.zorder` overlap test runs on.
    */
  def zLong(x: Long, y: Long): Long = {
    def spread(c0: Long): Long = {
      var c = c0 & 0xFFFFL
      c = (c | (c << 8)) & 0x00FF00FFL
      c = (c | (c << 4)) & 0x0F0F0F0FL
      c = (c | (c << 2)) & 0x33333333L
      (c | (c << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  /** Scalar twin of [[quantize16]] (same exact-integer affine map).
    * BigInt, matching the row side's DECIMAL(38,0): both survive
    * column spans past Long.MaxValue/65535 without wrapping, so the
    * planner's per-file z-intervals always bound the rows' z-values.
    * Planner-side only (file-stat corners), so cost is irrelevant.
    */
  def quantize16Long(v: Long, lo: Long, hi: Long): Long =
    if (hi == lo) 0L
    else ((BigInt(v) - BigInt(lo)) * 65535 / (BigInt(hi) - BigInt(lo))).toLong

  def hilbertD2(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Curve-range planning: the level-`levels` Hilbert buckets whose
    * grid cell intersects the quantized box [qx0,qx1]×[qy0,qy1] — the
    * IN-list a pruned scan of a Hilbert-clustered table needs. Works
    * because the top 2·levels bits of an order-16 Hilbert index
    * identify the level-`levels` grid cell (each level's 2 d-bits pick
    * a quadrant, recursively), and the curve visits each cell
    * CONTIGUOUSLY — so `cell index = d(corner) >> (32 − 2·levels)` for
    * any point in the cell. Cost is the box's cell count — pure
    * integer arithmetic on planner constants, O(1) in data size (the
    * Z-range planning every curve-clustered lake scan does before
    * touching a file).
    */
  def hilbertBucketsForBox(qx0: Long, qx1: Long, qy0: Long, qy1: Long,
                           levels: Int): Seq[Long] = {
    require(levels >= 1 && levels <= 16, s"levels out of range: $levels")
    val side = 1L << (16 - levels)
    val shift = 32 - 2 * levels
    (for {
      cx <- (qx0 / side) to (qx1 / side)
      cy <- (qy0 / side) to (qy1 / side)
    } yield hilbertD2(cx * side, cy * side) >>> shift).distinct.sorted
  }

  /** Curve-range COALESCING: contiguous inclusive [lo, hi] curve-index
    * ranges covering every level-`levels` cell that intersects the
    * quantized box — the standard curve-range scan predicate. At coarse
    * levels an IN-list is fine (level 3 ⇒ ≤ 64 cells); at fine levels
    * the cell count grows with the box AREA while Hilbert contiguity
    * keeps the run count near the box PERIMETER — a level-8 box of
    * thousands of cells collapses to tens of `hv BETWEEN lo AND hi`
    * disjuncts, which min/max row-group stats and partition pruning
    * both consume directly.
    *
    * Planned by QUADTREE DESCENT, not cell enumeration: a quadrant
    * disjoint from the box is skipped, one fully inside emits its
    * whole contiguous d-range in O(1), and only boundary quadrants
    * recurse — O(perimeter · levels) work, so a level-12 box of half a
    * million cells plans in milliseconds (the round-7 What's-wrong #3
    * boundary). No orientation bookkeeping: the curve visits every
    * quadrant contiguously and a quadrant's span divides its
    * alignment, so `hilbertD2(corner) >> shift` mod-aligned to the
    * span IS the quadrant's d-range start.
    */
  def hilbertRangesForBox(qx0: Long, qx1: Long, qy0: Long, qy1: Long,
                          levels: Int): Seq[(Long, Long)] = {
    require(levels >= 1 && levels <= 16, s"levels out of range: $levels")
    val shift = 32 - 2 * levels
    val cellSide = 1L << (16 - levels)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def visit(x0: Long, y0: Long, side: Long): Unit = {
      val x1 = x0 + side - 1; val y1 = y0 + side - 1
      if (x1 < qx0 || x0 > qx1 || y1 < qy0 || y0 > qy1) () // disjoint
      else {
        val cellsPerSide = side / cellSide
        val dSpan = cellsPerSide * cellsPerSide
        val d0 = { val d = hilbertD2(x0, y0) >>> shift; d - d % dSpan }
        if (x0 >= qx0 && x1 <= qx1 && y0 >= qy0 && y1 <= qy1)
          buf += ((d0, d0 + dSpan - 1)) // fully inside: whole sub-curve
        else if (side == cellSide)
          buf += ((d0, d0)) // boundary cell
        else {
          val h = side / 2
          visit(x0, y0, h); visit(x0 + h, y0, h)
          visit(x0, y0 + h, h); visit(x0 + h, y0 + h, h)
        }
      }
    }
    visit(0L, 0L, 65536L)
    buf.sortBy(_._1).foldLeft(Vector.empty[(Long, Long)]) {
      case (init :+ ((lo, hi)), (l2, h2)) if l2 <= hi + 1 =>
        init :+ (lo -> math.max(hi, h2))
      case (acc, r) => acc :+ r
    }
  }

  /** The ranges as one scan predicate on a curve-bucket column. */
  def rangesPredicate(bucketCol: Column,
                      ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) =>
      if (lo == hi) bucketCol === lit(lo) else bucketCol.between(lo, hi)
    }.reduce(_ || _)
}
