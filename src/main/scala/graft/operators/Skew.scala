package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators for hot-key workloads (SURVEY.md §4 / the
  * 100 TB mandate: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles sort-merge joins automatically
  * (enabled in GraftSession); these helpers cover the two places AQE
  * does not: hot-key AGGREGATION (a single reducer owning a hot group)
  * and broadcast-infeasible joins where one side's key distribution is
  * pathological.
  *
  * Results are identical to the unsalted equivalents — salting only
  * changes the physical distribution (verified in SkewSpec by
  * equality against the plain operators).
  */
object Skew {

  /** Two-phase salted sum-aggregation: phase 1 aggregates on
    * (keys, salt) — spreading each hot key over `saltBuckets` reducers —
    * phase 2 merges partials on the true keys. Valid for any
    * re-aggregatable aggregate; sums (incl. fixed-point sums and counts)
    * are the common case.
    *
    * Salt is `pmod(hash of the full row's spark partition + offset)` via
    * `monotonically_increasing_id` — uniform, and the final merge makes
    * the result independent of the salt assignment.
    */
  def saltedSumAgg(df: DataFrame, keys: Seq[Column],
                   sums: Seq[(Column, String)], saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(sum(sums.head._1).as(sums.head._2),
        sums.tail.map { case (c, n) => sum(c).as(n) }: _*)
    partial
      .groupBy(keys: _*)
      .agg(sum(col(sums.head._2)).as(sums.head._2),
        sums.tail.map { case (_, n) => sum(col(n)).as(n) }: _*)
  }

  /** Salted equi-join for a skewed big side: the small side is
    * replicated `saltBuckets`× (explode), the big side gets a uniform
    * salt, and the join key becomes (keys, salt). Row-for-row identical
    * to the plain join for big-side-preserving join types; the hot
    * key's rows land on `saltBuckets` different reducers instead of one.
    *
    * Right/full outer joins are REJECTED: the small side is exploded,
    * so each unmatched small row would surface `saltBuckets` times.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched exploded " +
        "small-side rows; use inner/left/left_semi/left_anti")
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
