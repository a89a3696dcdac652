package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching — HyperLogLog (Flajolet, Fusy,
  * Gandouet, Meunier 2007) re-expressed as two hash aggregations.
  *
  * The whole sketch is DECLARATIVE — no UDF, no UDAF, no driver loop:
  *
  *   1. per row: register index = top `p` bits of a splitmix64-mixed
  *      key hash, rho = leading-zero count of the remaining 64−p bits
  *      plus one (the classic HLL observable);
  *   2. `groupBy(group, register).agg(max(rho))` — the register table.
  *      Map-side partial max means shuffle volume is bounded by
  *      |groups|·m regardless of row count: the 100 TB shape;
  *   3. `groupBy(group).agg(sum(2^(rhoMax_shift)))` — the harmonic-sum
  *      fold, carried EXACTLY: each register contributes the integer
  *      2^(57−rho) (rho ≤ 57 for p=8), summed as decimal(38,0) so the
  *      worst case (m registers at rho=1 → m·2^56) cannot overflow, and
  *      empty registers contribute 2^57 each — added as a decimal
  *      product after the fact.
  *
  * Determinism: the hash is the repo's splitmix64 finalizer (same
  * constants as `NativeExprs.mix64`, here as wrapping Column arithmetic
  * — non-ANSI Spark longs wrap like the JVM), rho comes from exact
  * integer/string ops, the harmonic sum is an exact integer, and the
  * final estimate is a fixed sequence of IEEE double ops on exact
  * inputs — bit-identical at any parallelism and portable to a DuckDB
  * oracle (HUGEINT sums + the same double expression).
  *
  * The estimate is the RAW HLL estimator alpha_m·m²/Σ2^-M[j]. The
  * small-range (linear counting) and large-range corrections are
  * deliberately omitted: both pass through `ln`, which is not
  * correctly-rounded IEEE and would re-open the cross-engine ulp risk
  * the repo's numerics rules exist to close. Accuracy is the standard
  * ~1.04/√m relative error for n ≳ 2.5·m (= 640 at p=8); below that the
  * raw estimator reads high — callers counting tiny sets should use an
  * exact countDistinct (at that size it's cheap anyway).
  */
object Hll {

  /** Register-index bits: m = 2^p = 256 registers, σ ≈ 6.5%. */
  val P = 8
  val M_ = 1 << P // 256
  private val RhoMax = 64 - P + 1 // 57: w == 0 ⇒ all 64−p bits zero

  /** splitmix64 finalizer as wrapping Column arithmetic (constants =
    * `NativeExprs.mix64`). Works on any long column; non-ANSI sessions
    * wrap multiplication exactly like the JVM.
    */
  def mix64Col(c: Column): Column = {
    val z1 = c + lit(-7046029254386353131L)
    val z2 = z1.bitwiseXOR(shiftrightunsigned(z1, 30)) * lit(-4658895280553007687L)
    val z3 = z2.bitwiseXOR(shiftrightunsigned(z2, 27)) * lit(-7723592293110705685L)
    z3.bitwiseXOR(shiftrightunsigned(z3, 31))
  }

  /** Histogram quantile sketch: per-group fixed-bin counts over an
    * integer measure, folded into quantile BRACKETS — the scale path
    * for percentiles. Where the exact form (q33) sort-shuffles every
    * group, this is one min/max aggregate + one (group, bin) count
    * aggregate + a cumulative window over ≤ `bins` rows per group —
    * shuffle volume O(|groups|·bins) regardless of row count, and the
    * answer comes with a GUARANTEE: the true quantile lies inside the
    * returned bin's value bounds (width (hi−lo)/bins).
    *
    * All arithmetic is exact integers (bin index and bounds via integer
    * div on the measure's observed [lo, hi]) — engine-portable with no
    * double mixing anywhere.
    *
    * `measure` must be a long column (quantize doubles first, e.g.
    * `gf.fixed`). `pcts` are integer percentiles (50, 90, 99...).
    * Output: group..., n_items, then p<q>_lo / p<q>_hi per percentile.
    */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[Column],
                         measure: Column, bins: Int,
                         pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(groupCols :+ measure.as("_m"): _*)
    val dom = g.groupBy(groupCols: _*)
      .agg(min(col("_m")).as("_lo"), max(col("_m")).as("_hi"),
        count(lit(1)).as("n_items"))
    val groupNames = dom.columns.dropRight(3).toSeq
    // span = hi−lo+1 keeps hi in the last bin; constant groups → bin 0
    val binned = g.join(broadcast(dom), groupNames)
      .withColumn("_bin",
        call_function("div", (col("_m") - col("_lo")) * lit(bins.toLong),
          col("_hi") - col("_lo") + lit(1L)))
      .groupBy(groupNames.map(col) :+ col("_bin"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(groupNames.map(col): _*).orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("_cum", sum(col("_c")).over(w))
      .join(broadcast(dom), groupNames)
    // per percentile: the first bin whose cumulative count reaches
    // k = ceil(p·n/100) (exact integer, the q33 rule), reported as the
    // bin's exact value bounds. bin b holds m with
    // (m−lo)·bins div span ∈ [b, b+1), i.e. m−lo ∈
    // [ceil(b·span/bins), ceil((b+1)·span/bins) − 1] — the bounds use
    // CEILING division ((x + bins−1) div bins): floor here would shave
    // the bin's top value off the bracket (a one-unit containment leak,
    // loudest when span < bins — SketchesSpec's degenerate-span case).
    // Occupied bins (the only selectable ones) are always non-empty, so
    // the bracket is well-formed with no clamping.
    val span = col("_hi") - col("_lo") + lit(1L)
    def binFloor(b: Column) = col("_lo") +
      call_function("div", b * span + lit((bins - 1).toLong), lit(bins.toLong))
    val pctCols = pcts.flatMap { p =>
      val k = floor((col("n_items") * p + lit(99)) / lit(100)).cast("long")
      Seq(min(when(col("_cum") >= k, binFloor(col("_bin")))).as(s"p${p}_lo"),
        min(when(col("_cum") >= k, binFloor(col("_bin") + 1) - 1)).as(s"p${p}_hi"))
    }
    val aggs = max(col("n_items")).as("n_items") +: pctCols
    cum.groupBy(groupNames.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** EXACT per-group percentiles by two-pass DISTRIBUTED SELECTION —
    * the scale-correct form of "value at rank ceil(p·n/100)":
    *
    *   pass 1: the [[histogramQuantiles]] machinery locates, per
    *   (group, percentile), the BIN containing the target rank and the
    *   cumulative count before it — O(|groups|·bins) shuffle;
    *   pass 2: only rows landing in a target bin (≈ n/bins of the
    *   data) are ranked, inside (group, bin) — so the sort that a
    *   direct window formulation would run over EVERY row of a
    *   low-cardinality group (3 giant sort tasks for a 3-flag column
    *   at 100 TB) shrinks to tiny per-bin partitions.
    *
    * Output is IDENTICAL to the direct rank/count window form (same
    * integer index arithmetic, same element) — SketchesSpec pins the
    * equivalence against q33's oracle-checked formulation.
    * Returns group..., n_items, p<q> (long measure values).
    */
  def exactPercentilesSelect(df: DataFrame, groupCols: Seq[Column],
                             measure: Column, bins: Int,
                             pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.QueryCaches.CacheOps
    val g = df.select(groupCols :+ measure.as("_m"): _*)
    // |groups| rows, but its subtree is a FULL scan+aggregate of the
    // input — it feeds four broadcast sites below, so scope-cache it
    // (one scan, not four; guide §2.4 — the recomputed subtree was the
    // plan's dominant duplicated work)
    val dom = g.groupBy(groupCols: _*)
      .agg(min(col("_m")).as("_lo"), max(col("_m")).as("_hi"),
        count(lit(1)).as("n_items"))
      .persistScoped()
    val groupNames = dom.columns.dropRight(3).toSeq
    def binOf(m: Column) = call_function("div",
      (m - col("_lo")) * lit(bins.toLong), col("_hi") - col("_lo") + lit(1L))
    val binned = g.join(broadcast(dom), groupNames)
      .withColumn("_bin", binOf(col("_m")))
      .groupBy(groupNames.map(col) :+ col("_bin"): _*)
      .agg(count(lit(1)).as("_c"))
    val cumW = Window.partitionBy(groupNames.map(col): _*).orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("_cum", sum(col("_c")).over(cumW))
      .join(broadcast(dom), groupNames)
    // per (group, pct): target bin + how many rows precede it. The
    // percentile list rides as an exploded column so ONE pass over the
    // cumulative-histogram frame serves every percentile — the previous
    // per-pct union recomputed the whole cum subtree once per
    // percentile (3 duplicated scan+window chains in q33's plan).
    val targets = cum
      .select(cum.columns.map(col) :+
        explode(array(pcts.map(p => lit(p)): _*)).as("_p"): _*)
      .withColumn("_k",
        floor((col("n_items") * col("_p") + lit(99)) / lit(100)).cast("long"))
      .filter(col("_cum") >= col("_k"))
      .groupBy(groupNames.map(col) :+ col("_p"): _*)
      .agg(min(col("_bin")).as("_tbin"),
        max(col("_k")).as("_k2"), // constant within group
        min(col("_cum") - col("_c")).as("_before")) // cum before target bin
    // pass 2: rank ONLY the rows inside each (group, pct) target bin —
    // ≈ n/bins rows per window partition, never the whole group
    val inBin = g.join(broadcast(dom), groupNames)
      .withColumn("_bin", binOf(col("_m")))
      .join(broadcast(targets), groupNames)
      .filter(col("_bin") === col("_tbin"))
    val rankW = Window.partitionBy(groupNames.map(col) :+ col("_p"): _*)
      .orderBy(col("_m"))
    val picked = inBin.withColumn("_rn", row_number().over(rankW))
      .filter(col("_rn") === col("_k2") - col("_before"))
      .select(groupNames.map(col) :+ col("_p") :+ col("_m").as("_val"): _*)
    val pctAggs = pcts.map(p =>
      max(when(col("_p") === p, col("_val"))).as(s"p$p"))
    picked.groupBy(groupNames.map(col): _*)
      .agg(pctAggs.head, pctAggs.tail: _*)
      .join(broadcast(dom.select(groupNames.map(col) :+ col("n_items"): _*)),
        groupNames)
      .select((groupNames.map(col) :+ col("n_items")) ++
        pcts.map(p => col(s"p$p")): _*)
  }

  /** Per-group HLL register table: (groupCols..., j, rho_max).
    * `key` must be a long column.
    */
  def registers(df: DataFrame, key: Column, groupCols: Seq[Column]): DataFrame = {
    val h = mix64Col(key)
    val j = shiftrightunsigned(h, 64 - P) // top p bits → register index
    // low 64−p bits; rho = leading zeros within that window + 1
    //   = 57 − bit_length(low56). bit_length via conv→binary-string
    // (exact integer semantics, engine-portable: DuckDB bin() mirrors it);
    // conv renders 0 as "0" (length 1), so the w=0 case is explicit.
    val low = h.bitwiseAND(lit((1L << (64 - P)) - 1))
    val rho = when(low === 0, lit(RhoMax))
      .otherwise(lit(RhoMax) - length(conv(low, 10, 2)))
    df.select(groupCols :+ j.as("j") :+ rho.as("rho"): _*)
      .groupBy(groupCols :+ col("j"): _*)
      .agg(max(col("rho")).as("rho_max"))
  }

  /** [[registers]] rebuilt on the native aggregate
    * ([[graft.functions.HllAggExpr]]): same (groupCols..., j, rho_max)
    * register table, but built by ONE ObjectHashAggregate shipping a
    * 256-byte buffer per (group, task) instead of shuffling
    * |groups|·256 register rows through two hash aggregations. The
    * explode back to rows is |groups|·(hit registers) — driver-frame
    * sized — and feeds the UNCHANGED [[estimate]] fold, so estimates
    * stay bit-identical to the declarative form (NativeAggSpec).
    */
  def registersAgg(df: DataFrame, key: Column, groupCols: Seq[Column]): DataFrame = {
    graft.functions.NativeExprs.ensureRegistered(df.sparkSession)
    val agged = df.select(groupCols :+ mix64Col(key).as("_h"): _*)
      .groupBy(groupCols: _*)
      .agg(call_function("graft_hll_agg", col("_h")).as("_regs"))
    val keep = agged.columns.filter(_ != "_regs").toSeq
    agged.select(keep.map(col) :+
        posexplode(col("_regs")).as(Seq("_j", "rho_max")): _*)
      .filter(col("rho_max") > 0)
      .select(keep.map(col) :+ col("_j").cast("long").as("j") :+ col("rho_max"): _*)
  }

  /** Fold a register table into (groupCols..., hll_estimate,
    * n_registers_hit). The harmonic sum is exact: Σ 2^(57−rho) over hit
    * registers (decimal) + 2^57 per empty register.
    */
  def estimate(regs: DataFrame, groupCols: Seq[Column]): DataFrame = {
    // scala shiftleft() only takes a literal shift; the SQL form takes a column
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - rho_max)").cast("decimal(38,0)")
    val emptyTerm = lit(1L << RhoMax).cast("decimal(38,0)") // 2^57
    val agged = regs.groupBy(groupCols: _*)
      .agg(sum(term).as("s_hit"), count(lit(1)).as("n_registers_hit"))
    // alpha_m · m² · 2^57 / S — written in THIS exact literal/op order in
    // the DuckDB oracle too, so the double math is bit-identical.
    val s = col("s_hit") +
      (lit(M_.toLong) - col("n_registers_hit")).cast("decimal(38,0)") * emptyTerm
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M_.toDouble))
    val est = alpha * lit((M_.toLong * M_.toLong).toDouble) *
      lit((1L << RhoMax).toDouble) / s.cast("double")
    agged.select(groupCols :+ est.as("hll_estimate") :+ col("n_registers_hit"): _*)
  }
}

/** KMV — k-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
  * "bottom-k" ancestor of the Theta sketch): keep the k smallest values
  * of a 64-bit bijective mix of the key; the k-th smallest, read as a
  * fraction of the hash space, estimates the distinct count as
  * `(k−1)·2^64 / U(h_(k))`. What HLL cannot do and KMV can: the
  * retained keys form a uniform SAMPLE of the distinct set, so sketches
  * COMPOSE under set algebra — the union sketch is the k smallest of
  * the merged samples, and counting which union-sample keys belong to
  * each operand estimates Jaccard and intersection size (the Theta
  * sketch's whole value proposition, h04's subject).
  *
  * Scale shape: distinct → mix → global top-k plans as
  * TakeOrderedAndProject: per-partition k-heaps merged on the driver's
  * k rows — no global sort, no single-partition window, shuffle bounded
  * by partitions·k. mix64 is a BIJECTION on int64, so distinct keys
  * cannot collide and the hash order is total with no tiebreak column.
  *
  * Determinism: `uh` = mixed hash XOR Long.MinValue — signed order ≡
  * unsigned hash order — and the estimate is a fixed IEEE chain
  * (long→double, +2^63, one divide) on exact integers, written
  * operand-for-operand like the DuckDB oracle so results are
  * bit-identical, not approximately equal.
  */
object Kmv {

  /** Default sketch size: σ ≈ 1/√(k−2) ≈ 6.3%. */
  val K = 256

  /** The sketch hash: splitmix64-mixed key, XOR Long.MinValue so signed
    * ascending order ≡ unsigned hash order (the whole sketch suite's
    * ordering convention, shared with the DuckDB oracles' HUGEINT mix).
    */
  def uhCol(key: Column): Column =
    Hll.mix64Col(key).bitwiseXOR(lit(Long.MinValue))

  /** The sketch: ≤ k rows (key, uh), uh ascending ≡ unsigned hash
    * order. Keys need not be pre-deduplicated.
    */
  def sketch(keys: DataFrame, keyCol: String, k: Int): DataFrame =
    keys.select(col(keyCol).as("key")).distinct()
      .select(col("key"), uhCol(col("key")).as("uh"))
      .orderBy(col("uh")).limit(k)

  /** Per-GROUP sketch as ONE aggregate column
    * ([[graft.functions.KmvAggExpr]]): `groupBy(...).agg(sketchAgg(uh))`
    * returns each group's ascending bottom-k hash array. This is the
    * tree-aggregation form — partial sketches fold map-side and the
    * shuffle carries ≤ k longs per (group, task), vs [[sketch]]'s
    * per-row hash shuffle. Callers must `NativeExprs.ensureRegistered`.
    */
  def sketchAgg(uh: Column, k: Int): Column =
    call_function("graft_kmv_agg", uh, lit(k))

  /** Union of two SKETCHES without revisiting the base data: keys in
    * both operands carry the same bijective hash twice, so the merge
    * MUST dedup before taking the bottom k — skipping the distinct
    * reaches the k-th row after fewer distinct hashes and overestimates
    * (~40% high at 50% overlap, smoke-pinned).
    */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).distinct().orderBy(col("uh")).limit(k)

  /** Distinct estimate from a sketch's max `uh` plus the exact key
    * count when it is at hand (a sketch holding fewer than k keys IS
    * the exact distinct set — the estimator only applies at ≥ k).
    * `(k−1)·2^64` is an exact double (255·2^64 needs 8 mantissa bits);
    * the denominator reconstructs U(h_(k)) = uh + 2^63 in doubles with
    * the same two ops on both engines.
    */
  def estimate(maxUh: Column, n: Column, k: Int): Column =
    when(n < k, n.cast("double"))
      .otherwise(lit((k - 1).toDouble * 1.8446744073709552E19) /
        (maxUh.cast("double") + lit(9.223372036854776E18)))
}

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as two
  * hash aggregations — the frequency member of the sketch suite
  * (cardinality: [[Hll]], quantiles: [[Hll.histogramQuantiles]],
  * membership: [[BloomPrune]], similarity: MinHash/SimHash).
  *
  * Counters are a depth×width (3×1024) integer matrix: each occurrence
  * increments one cell per row, cell = 10-bit slice of the item's
  * splitmix64'd FNV hash (`graft_hash64` — the repo's canonical string
  * hash, already ported to DuckDB SQL). Build shuffle volume collapses
  * to ≤ 3072 cells after map-side combine REGARDLESS of corpus size —
  * the whole point vs a full-vocabulary count. Estimates are the
  * classic min-over-rows and are one-sided: never below the true
  * count (spec-pinned), inflated only by collisions (ε ≈ e/1024 of
  * total mass per row).
  *
  * Everything is exact integer arithmetic on a deterministic hash, so
  * the sketch itself — not just its qualitative behavior — is
  * hash-compared against the DuckDB oracle.
  */
object CountMin {

  val Width = 1024 // 10-bit column index per row
  val Depth = 3

  /** The per-row column positions of an item hash: 10-bit slices. */
  def positions(h: Column): Seq[Column] =
    (0 until Depth).map(i =>
      shiftrightunsigned(h, i * 10).bitwiseAND(lit((Width - 1).toLong)))

  /** (row, colm, cell) counter matrix over every item occurrence.
    * Requires graft functions registered.
    */
  def build(items: DataFrame, itemCol: String): DataFrame = {
    val h = call_function("graft_hash64", col(itemCol))
    items.select(posexplode(array(positions(h): _*)).as(Seq("row", "colm")))
      .groupBy(col("row"), col("colm"))
      .agg(count(lit(1)).as("cell"))
  }

  /** [[build]] rebuilt on the native aggregate
    * ([[graft.functions.CmsAggExpr]]): same touched-cell (row, colm,
    * cell) table, but built by ONE ObjectHashAggregate folding every
    * occurrence into a 24 KB counter buffer map-side — the declarative
    * form explodes Depth rows per occurrence and shuffles 3× the corpus
    * into a hash aggregation. The explode back to rows is ≤ Depth·Width
    * = 3072 rows total, and feeds the UNCHANGED [[estimate]] min-fold,
    * so h03's output stays bit-identical (NativeAggSpec).
    */
  def buildAgg(items: DataFrame, itemCol: String): DataFrame = {
    graft.functions.NativeExprs.ensureRegistered(items.sparkSession)
    items
      .select(call_function("graft_hash64", col(itemCol)).as("_h"))
      .agg(call_function("graft_cms_agg", col("_h")).as("_cells"))
      .select(posexplode(col("_cells")).as(Seq("_i", "cell")))
      .filter(col("cell") > 0)
      .select(floor(col("_i") / lit(Width)).cast("int").as("row"),
        (col("_i") % lit(Width)).cast("long").as("colm"), col("cell"))
  }

  /** Point estimates for a key frame: min over rows of the key's
    * cells; keys hashing into never-touched cells read 0.
    */
  def estimate(keys: DataFrame, itemCol: String, counters: DataFrame): DataFrame = {
    val h = call_function("graft_hash64", col(itemCol))
    keys.select(col(itemCol), posexplode(array(positions(h): _*)).as(Seq("row", "colm")))
      .join(counters, Seq("row", "colm"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cell"), lit(0L))).as("cms_est"))
  }
}
