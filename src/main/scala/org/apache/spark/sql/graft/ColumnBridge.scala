package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst-Expression bridge plus session-level function
  * registration. Lives under org.apache.spark.sql because the classic
  * converters and the session state are package-private — the standard
  * pattern for Spark extension libraries.
  */
object ColumnBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native function into an EXISTING session's registry
    * (the SparkSessionExtensions path only applies at builder time).
    */
  def registerFunction(spark: SparkSession, name: String, className: String,
                       builder: Seq[Expression] => Expression): Unit = {
    org.apache.spark.sql.classic.ClassicConversions.castToImpl(spark)
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder)
    ()
  }
}
