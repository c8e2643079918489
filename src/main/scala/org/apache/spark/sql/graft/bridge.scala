/* Bridge into Spark's private[sql] Column <-> Expression converters.
 *
 * Spark 4 unified `Column` around ColumnNode (Connect + classic); the
 * classic-side converters live in org.apache.spark.sql.classic.ExpressionUtils
 * as private[sql]. Custom Catalyst expressions (graft.functions.BoundedTopK)
 * need exactly these two functions, so this file sits in a subpackage of
 * org.apache.spark.sql — the standard extension-library pattern (same move
 * as delta/frameless bridges). Nothing else from the private API is used.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Public alias for the private[sql] supertype of DataType used by
    * `ExpectsInputTypes.inputTypes` — needed so custom expressions outside
    * org.apache.spark.sql can declare analyzer-checked input types. */
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  /** Register a function builder on an existing session's registry
    * (sessionState is private[sql]; new sessions should use
    * spark.sql.extensions with graft.GraftExtensions instead). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
