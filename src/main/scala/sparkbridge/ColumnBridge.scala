package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversion for
  * custom Catalyst expressions (Spark 4 wraps Expressions in
  * ColumnNodes). Lives in the `classic` package solely for access.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode→Expression conversion. [[expression]] wraps the
    * node lazily (ColumnNodeExpression), which only resolves through
    * the classic Dataset API; builders injected into the
    * FunctionRegistry need a real catalyst tree up front. */
  def expressionEager(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** Register graft's SQL functions on an ALREADY-RUNNING session
    * (`spark.sql.extensions` only applies at session construction). */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.asInstanceOf[SparkSession].sessionState.functionRegistry
    graft.plans.GraftExtensions.builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
