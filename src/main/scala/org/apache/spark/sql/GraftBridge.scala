package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim for `private[sql]` planning entry points — the standard
  * technique Spark extension libraries use to materialize a custom
  * `LogicalPlan` (e.g. [[graft.plans.AsofJoin]]) as a `DataFrame`: Spark
  * exposes plan CONSTRUCTION via `SparkSessionExtensions` but not plan
  * EXECUTION, so the one-liner lives in Spark's package namespace. No
  * internals are modified; this is only a visibility bridge.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
