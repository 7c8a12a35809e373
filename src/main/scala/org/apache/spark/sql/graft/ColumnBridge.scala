package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's native expressions.
  *
  * Spark 4 made `Column` wrap an opaque ColumnNode and moved the classic
  * converters behind `private[sql]` — the supported routes to a custom
  * Expression are the function registry (used by [[graft.functions.Vectors]]
  * for the SQL-facing functions) or this package-placement shim (the
  * standard extension idiom for column-builder helpers that have no
  * SparkSession in scope to register against, e.g.
  * [[graft.operators.PortableHash.h60]] which is called from pure Column
  * builders in 30 sites). Only the two converters are exposed; nothing
  * else of the internal API leaks.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
