package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Expression→Column constructor for graft's native Catalyst
  * expressions. Lives under org.apache.spark.sql because the Column
  * companion's expression constructor is private[sql] in Spark 4 —
  * the same bridge pattern public Spark extension libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
}
