package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into Spark's `private[sql] Dataset.ofRows` so graft's custom
  * logical plan nodes ([[graft.plans.AsOfMergeJoinPlan]]) can become
  * DataFrames. The one-liner lives in this package solely for the
  * access qualifier — everything it touches is stock Spark.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Unwrap a row-level rewrite's `RowLevelOperationTable` to the
    * underlying catalog table (the wrapper is `private[sql]` — same
    * access-qualifier bridge as `ofRows`).
    */
  def unwrapRowLevelTable(
      t: org.apache.spark.sql.connector.catalog.Table)
      : org.apache.spark.sql.connector.catalog.Table = t match {
    case r: org.apache.spark.sql.connector.write.RowLevelOperationTable => r.table
    case other => other
  }
}
