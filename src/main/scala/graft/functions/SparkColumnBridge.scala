package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters — Spark 4
  * moved `Column` to a backend-agnostic API, so first-party custom Catalyst
  * expressions (graft.functions.VectorExpressions) need this one hop to be
  * exposed as `Column`s. Lives in the spark.sql package solely to satisfy
  * the access qualifier; nothing here is engine logic. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Temp-function registration on a live session (the extensions path,
    * graft.GraftExtensions, covers builder-time injection). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
