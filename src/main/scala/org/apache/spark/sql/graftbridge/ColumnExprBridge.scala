/*
 * Bridge between the public Column API and Catalyst Expressions.
 *
 * Spark 4 split `Column` from Catalyst (columns wrap `ColumnNode`s so the
 * same API serves classic and Connect); the two conversion helpers that
 * connect them — `ExpressionUtils.column` / `ExpressionUtils.expression`
 * in `org.apache.spark.sql.classic` — are `private[sql]`. This one-object
 * shim lives in a nested package of `org.apache.spark.sql` purely to
 * re-export them to graft, the standard technique for Spark extension
 * libraries that register composite functions in the FunctionRegistry
 * (the registry wants `Seq[Expression] => Expression` builders, while the
 * function bodies are written once as Column combinators).
 *
 * Nothing else from the internal API is touched, and the conversions are
 * structural (no session state): `column` wraps an Expression in an
 * `ExpressionColumnNode`; `expression` runs the node converter, emitting
 * (possibly unresolved) Catalyst expressions that the analyzer resolves
 * in its normal fixed point.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

object ColumnExprBridge {
  /** Wrap a Catalyst expression as a Column (ExpressionColumnNode). */
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Convert a Column's node tree to a Catalyst expression tree EAGERLY
    * (`ExpressionUtils.expression` would wrap it in a lazy
    * `ColumnNodeExpression` placeholder, which only plan-level conversion
    * unwraps — substituted into a plan from a FunctionRegistry builder it
    * survives to codegen and throws CANNOT_GENERATE_CODE). The result may
    * contain UnresolvedFunction / lambda-variable nodes; the analyzer
    * resolves them wherever the expression is substituted.
    */
  def toExpression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Test hook: apply a SparkSessionExtensions' injected functions to a
    * FunctionRegistry, exactly as BaseSessionStateBuilder does at session
    * construction (`registerFunctions` is `private[sql]`). Lets a spec
    * exercise the real `spark.sql.extensions` injection path against a
    * fresh `newSession()` registry without tearing down the shared
    * SparkContext.
    */
  def applyFunctionInjections(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
