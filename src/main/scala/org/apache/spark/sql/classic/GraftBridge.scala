package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package bridge: `Dataset.ofRows` is `private[sql]`, and
  * wrapping a DataFrame's analyzed plan in a custom logical node (see
  * graft.plans.TopKPerGroup) needs a way back to a public DataFrame.
  * Standard pattern for out-of-tree Spark plan extensions.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
