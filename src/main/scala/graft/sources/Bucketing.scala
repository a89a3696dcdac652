package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins (the 100 TB mandate:
  * "repartition/bucketing for co-located joins").
  *
  * Two tables bucketed by the same key into the same bucket count join
  * WITHOUT a shuffle on either side — the scan's output partitioning
  * already satisfies the join's distribution requirement, so the plan
  * is Scan → Sort → SortMergeJoin with no Exchange (asserted in
  * BucketingSpec). At 100 TB this converts every recurring fact-fact
  * join on the bucket key from two full-data shuffles into zero.
  */
object Bucketing {

  /** Write `df` as a bucketed (and sorted) managed table. Bucketing
    * requires the table catalog (bucket metadata lives there); plain
    * `parquet(path)` cannot carry it.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
