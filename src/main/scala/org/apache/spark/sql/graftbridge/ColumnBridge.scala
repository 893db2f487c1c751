package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the conversion helpers
  * `private[sql]`; extension libraries conventionally expose them via a
  * shim in the sql package (same pattern as public Spark-extension
  * projects use for Dataset factories). Only used by
  * [[graft.functions.VectorFunctions]]. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
