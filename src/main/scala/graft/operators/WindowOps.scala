package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable window-function operators (SURVEY.md §2.5, W1–W16).
  *
  * All helpers are pure plan constructors — they add columns to a
  * DataFrame and let Catalyst plan the `WindowExec`. Each distinct
  * `partitionBy` incurs one shuffle on its keys; helpers that need
  * multiple windows over the SAME partitioning share it so Spark reuses
  * the exchange (visible as a single Exchange feeding stacked Window
  * nodes in `.explain`). Skew note for 100 TB: a window partitioned by a
  * hot key serializes that key into one task — keep window partitions at
  * entity/date granularity, never a global `Window.orderBy` without
  * partitioning (which collapses to a single task).
  */
object WindowOps {

  /** W1/W3: `rank()` per partition. Ordering should be made total (add a
    * tiebreak column) when the value can tie, or ranks differ run-to-run.
    */
  def rankBy(partition: Seq[Column], order: Seq[Column]): Column =
    rank().over(Window.partitionBy(partition: _*).orderBy(order: _*))

  /** W13: `dense_rank()` per partition. */
  def denseRankBy(partition: Seq[Column], order: Seq[Column]): Column =
    dense_rank().over(Window.partitionBy(partition: _*).orderBy(order: _*))

  /** W2/W5-W7: `lag(value)` one step back per partition. */
  def lagBy(value: Column, partition: Seq[Column], order: Seq[Column]): Column =
    lag(value, 1).over(Window.partitionBy(partition: _*).orderBy(order: _*))

  /** W11: dual ranking — best-first and worst-first in one pass over the
    * same partitioning (ASVSP `q05:25-26`, `q09:17-18`). Both windows
    * share one Exchange.
    */
  def dualRank(df: DataFrame, partition: Seq[Column], value: Column,
               bestCol: String = "rank_best", worstCol: String = "rank_worst"): DataFrame = {
    val w = Window.partitionBy(partition: _*)
    df.withColumn(bestCol, rank().over(w.orderBy(value.desc)))
      .withColumn(worstCol, rank().over(w.orderBy(value.asc)))
  }

  /** W8: running total over an ordered partition. */
  def runningTotal(value: Column, partition: Seq[Column], order: Seq[Column]): Column =
    sum(value).over(Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W9: row-based moving mean over the previous `n-1` rows + current —
    * row-based, not range-based, so date gaps still count n rows (the
    * reference's 30-day MA is the same, ASVSP `q06:8-14`).
    *
    * Takes a FIXED-POINT (long) value column and divides at the end:
    * windowed float aggregation is order-sensitive (segment-tree vs
    * streaming frame evaluation differ across engines and partition
    * splits); integer frame sums are exact.
    */
  def movingMeanFixed(valueFixed: Column, partition: Seq[Column],
                      order: Seq[Column], n: Int, scale: Double): Column = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(-(n - 1), Window.currentRow)
    sum(valueFixed).over(w).cast("double") / count(lit(1)).over(w) / scale
  }

  /** W12: gaps-and-islands growth streaks (ASVSP `q10:25-52`).
    *
    * Marks rows where `value > lag(value)` ("improved"), groups
    * consecutive improved rows into islands via the cumulative count of
    * non-improved rows, and returns one row per (partition, island):
    * `streak_len` and `streak_start` (= min of `orderKey` in the island).
    * Input must have one row per `orderKey` per partition.
    */
  def growthStreaks(df: DataFrame, partition: Seq[Column], orderKey: Column,
                    value: Column): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(orderKey)
    val flagged = df
      .withColumn("improved",
        when(value > lag(value, 1).over(w), 1).otherwise(0))
      .withColumn("grp",
        sum(when(col("improved") === 0, 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .filter(col("improved") === 1)
      .groupBy((partition :+ col("grp")): _*)
      .agg(
        count(lit(1)).as("streak_len"),
        min(orderKey).as("streak_start"))
      .drop("grp")
  }

  /** W16: keep top-k rows per partition by rank over a total ordering. */
  def topKPerGroup(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rnk"): DataFrame =
    df.withColumn(rankCol,
        rank().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= k)
}
