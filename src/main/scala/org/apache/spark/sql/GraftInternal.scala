package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into `Dataset.ofRows` (private[sql]) so graft's custom logical
  * plan ([[graft.plans.AsofJoinNode]]) can be wrapped as a DataFrame —
  * the standard extension-library shim; no other internals are touched.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(
      spark.asInstanceOf[ClassicSparkSession], plan)
}
