package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Bridge into `Dataset.ofRows` (private[sql]) so graft's custom logical
  * plan ([[graft.plans.AsofJoinNode]]) can be wrapped as a DataFrame, and
  * into the listener bus flush (private[spark]) so observation collectors
  * can drain deterministically — the standard extension-library shim; no
  * other internals are touched.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(
      spark.asInstanceOf[ClassicSparkSession], plan)

  /** Block until queued listener events (incl. QueryExecutionListener
    * deliveries) have been processed.
    */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
