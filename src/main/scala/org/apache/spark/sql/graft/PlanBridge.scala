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
}
