package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins (point-in-interval, interval-overlap) as BINNED
  * equi-joins — the join family Spark plans as BroadcastNestedLoopJoin
  * (or a cartesian) when written with a raw theta predicate.
  *
  * Technique: quantize the range dimension into fixed-width bins; an
  * interval materializes one row per bin it touches (`sequence` +
  * `explode`), a point lands in exactly one bin; the join becomes a
  * hash/sort-merge equi-join on (keys…, bin) followed by the exact
  * predicate as a post-filter. At 100 TB this is a single shuffle on the
  * bin key instead of an O(|L|·|R|) nested loop; bin width tunes the
  * explode factor (≈ interval_width / binWidth rows per interval)
  * against candidate precision, and optional equi-`keys` co-partition
  * the ranges so only same-key bins meet.
  *
  * Overlap pairs that share several bins are NOT deduplicated with a
  * `distinct()` (an extra shuffle): a pair is kept only in the FIRST bin
  * both intervals cover — `floor(max(lo_a, lo_b)/w)` — which each pair
  * matches exactly once.
  *
  * Columns of the two inputs must be disjoint (alias first), as in
  * [[AsOfJoin]]. Bin keys are computed in double arithmetic; callers
  * join timestamps by casting to epoch seconds first.
  */
object RangeJoin {

  private def bin(c: Column, w: Double): Column =
    floor(c.cast("double") / w).cast("long")

  /** For each point row, every interval row (same `keys`) with
    * `lo <= point <= hi` — inclusive bounds. Output: point columns ++
    * interval columns. One equi-join on (keys, bin); each matching pair
    * meets exactly once (the point's own bin), so no dedup is needed.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    val p = points.withColumn("__bin", bin(col(pointCol), binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol), binWidth), bin(col(hiCol), binWidth))))
    p.join(i, keys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** All (a, b) pairs (same `keys`) whose [lo, hi] intervals overlap:
    * `a.lo <= b.hi AND b.lo <= a.hi`. Output: a columns ++ b columns.
    * Both sides explode into their covered bins; the exact predicate
    * plus the first-overlapping-bin guard keep each qualifying pair
    * exactly once without a distinct().
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      binWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    val ea = a.withColumn("__bin",
      explode(sequence(bin(col(aLo), binWidth), bin(col(aHi), binWidth))))
    val eb = b.withColumn("__bin",
      explode(sequence(bin(col(bLo), binWidth), bin(col(bHi), binWidth))))
    ea.join(eb, keys :+ "__bin")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__bin") === bin(greatest(col(aLo), col(bLo)), binWidth))
      .drop("__bin")
  }
}
