package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic EXACT sampling operators.
  *
  * The repo's sampling primitive is hash-order selection: rank rows by
  * `md5(id)` — a seed-free uniform permutation every engine reproduces —
  * and keep a prefix of exact size. Unlike Bernoulli `sample()`, stratum
  * fractions are hit EXACTLY and the kept set is reproducible anywhere.
  *
  * This object carries the SCALE form of that primitive (the round-4
  * verdict's last perf item): a stratum-wide `row_number()` sorts the
  * ENTIRE stratum in one window partition — 3 giant sort tasks for a
  * 3-language corpus at 100 TB. [[stratifiedExact]] instead applies the
  * q33 distributed-selection shape to sampling:
  *
  *   1. bucket each row by the first two hex chars of its hash — 256
  *      buckets whose NUMERIC order equals the hash's lexicographic
  *      order (lowercase hex: '0'..'9' < 'a'..'f' in ASCII), so the
  *      global hash permutation is exactly (bucket, remaining hash);
  *   2. per (stratum, bucket): count rows — one narrow aggregation;
  *      cumulative offsets need a window over ≤256 rows per stratum;
  *   3. rank rows only INSIDE (stratum, bucket) windows (~n/256 rows
  *      each); the stratum-global rank is offset + in-bucket rank —
  *      bit-identical to the stratum-wide sort, with the largest sort
  *      partition shrunk 256-fold.
  *
  * keepN = ceil(n·num/den) carried as EXACT integer arithmetic
  * ((n·num + den − 1) div den) — no doubles anywhere.
  */
object Sampling {

  /** Exact stratified num/den sampling without a full per-stratum sort.
    *
    * Input: any frame; `stratum` and `id` name existing columns (id must
    * be unique — it breaks hash ties). Output: (id, stratum,
    * sample_rank int), the ceil(n·num/den) rows of each stratum with the
    * smallest (md5(id), id), ranked 1..keepN — byte-identical to
    * `row_number() OVER (PARTITION BY stratum ORDER BY md5(id), id)`
    * filtered to the prefix.
    */
  def stratifiedExact(df: DataFrame, stratum: String, id: String,
                      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "need 0 < num/den <= 1")
    val hashed = df.select(col(id), col(stratum),
        md5(col(id).cast("string").cast("binary")).as("h"))
      .withColumn("bkt", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val counts = hashed.groupBy(col(stratum), col("bkt"))
      .agg(count(lit(1)).as("bc"))
    val wPrefix = Window.partitionBy(col(stratum)).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("off", coalesce(sum(col("bc")).over(wPrefix), lit(0L)))
      .withColumn("n", sum(col("bc")).over(Window.partitionBy(col(stratum))))
      .select(col(stratum), col("bkt"), col("off"),
        call_function("div",
          col("n") * num + lit((den - 1).toLong), lit(den.toLong)).as("keep_n"))
    // offsets is |strata|·256 rows — broadcast; the only shuffles of the
    // data itself are the count agg and the small per-bucket windows
    val wBkt = Window.partitionBy(col(stratum), col("bkt"))
      .orderBy(col("h"), col(id))
    hashed.join(broadcast(offsets), Seq(stratum, "bkt"))
      .withColumn("sample_rank",
        (col("off") + row_number().over(wBkt)).cast("int"))
      .filter(col("sample_rank") <= col("keep_n"))
      .select(col(id), col(stratum), col("sample_rank"))
  }

  /** Weighted SYSTEMATIC sampling (probability-proportional-to-size
    * without replacement of positions): lay every row's integer weight
    * end-to-end along the deterministic md5(id) permutation, then take
    * one pick at each of the `nPicks` evenly spaced offsets
    * step, 2·step, …, nPicks·step (step = total div nPicks) — the
    * data-mixing primitive ("sample 20 docs proportional to token
    * count") with EXACT integer semantics: a row is picked once per
    * boundary its [cum−w, cum) interval crosses, so heavy rows can
    * repeat (classic PPS-systematic) and expected multiplicity is
    * w/step with zero variance beyond the permutation itself.
    *
    * The global prefix sum uses the same hash-prefix bucketing as
    * [[stratifiedExact]]: per-bucket cumulative windows (~n/256 rows) +
    * a 256-row offset table — no single-partition scan anywhere, which
    * is what makes a "global running total" admissible at 100 TB.
    *
    * `weight` must be a positive long column. Output: (pick_k long
    * 1..nPicks, id, weight-column) ordered by pick position.
    */
  def weightedSystematic(df: DataFrame, id: String, weight: String,
                         nPicks: Int): DataFrame = {
    require(nPicks > 0, "need nPicks > 0")
    val hashed = df.select(col(id), col(weight),
        md5(col(id).cast("string").cast("binary")).as("h"))
      .withColumn("bkt", conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val counts = hashed.groupBy(col("bkt")).agg(sum(col(weight)).as("bw"))
    val wPrefix = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤256 rows total: the unpartitioned windows here are over the
    // bucket TABLE, not the data
    val offsets = counts
      .withColumn("off", coalesce(sum(col("bw")).over(wPrefix), lit(0L)))
      .withColumn("total", sum(col("bw")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bkt"), col("off"),
        greatest(call_function("div", col("total"), lit(nPicks.toLong)), lit(1L))
          .as("step"))
    val wBkt = Window.partitionBy(col("bkt")).orderBy(col("h"), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hashed.join(broadcast(offsets), Seq("bkt"))
      .withColumn("cum", col("off") + sum(col(weight)).over(wBkt))
      .withColumn("first_k",
        call_function("div", col("cum") - col(weight), col("step")) + 1)
      .withColumn("last_k",
        least(call_function("div", col("cum"), col("step")), lit(nPicks.toLong)))
    cum.filter(col("first_k") <= col("last_k"))
      .select(explode(sequence(col("first_k"), col("last_k"))).as("pick_k"),
        col(id), col(weight))
  }
}
