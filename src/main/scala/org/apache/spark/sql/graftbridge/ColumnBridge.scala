package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4's `Column` wraps a `ColumnNode`, and the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are private[sql] — the
  * sanctioned trick for libraries shipping native Catalyst expressions is a
  * shim inside the `org.apache.spark.sql` package tree (the same approach
  * spark-connectors and spark-nlp use). This is the only file that lives
  * outside `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
