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

  /** Column ⇄ Expression for constructing data-parameterized expressions
    * (e.g. a PQ codebook captured in the expression) DIRECTLY, instead of
    * routing them through the shared session function registry, whose
    * latest-wins named binding is a temporal-coupling hazard when two
    * corpora are queried on one session.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** The standard WRONG_NUM_ARGS analysis error for a fixed-arity function
    * builder — `QueryCompilationErrors` is `private[sql]`, so the guard
    * in [[graft.functions.GraftFunctions]] raises it through this shim.
    */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected), actual)
}
