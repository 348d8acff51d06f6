/* Bridge into Spark's `private[sql]` Column ↔ Expression converters
 * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4 Column-node
 * API). Lives in a subpackage of org.apache.spark.sql solely for access;
 * contains no logic. This is the standard pattern third-party Catalyst
 * extensions use to lift a custom Expression into a Column without
 * requiring session-level function registration.
 */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — the entry point for custom logical operators like
    * `graft.plans.TopKPerGroup`.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** The running task's memory-manager page size
    * (`TaskContext.taskMemoryManager` is `private[spark]`) — needed to
    * construct an `UnsafeKVExternalSorter` from a custom exec node.
    */
  def taskPageSizeBytes(): Long =
    org.apache.spark.TaskContext.get().taskMemoryManager().pageSizeBytes()

  /** Catalyst's floating-point key normalization (`NormalizeFloatingNumbers
    * .normalize` is `private[sql]`): 0.0/-0.0 and all NaN payloads collapse
    * to one canonical value. The built-in rule rewrites only Aggregate/
    * Window/Join keys — a custom grouping operator must apply it itself or
    * byte-equality grouping splits float keys the window form would merge.
    * No-op for types that don't need it.
    */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
