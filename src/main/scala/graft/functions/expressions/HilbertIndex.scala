package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Hilbert-curve position of (x, y) on the
  * 2^bits-per-side grid — the iterative xy→d walk as ONE generated call.
  *
  * Why an Expression rather than a `Column` tree: the walk's
  * rotate/reflect step rewrites x and y in terms of BOTH previous
  * values, so unrolling it into `when` combinators doubles the tree per
  * bit plane — at bits = 5 the serialized plan carried a ~1.2 MB task
  * binary and Janino/C2 re-paid 4–7 s of compilation per fresh plan
  * (measured in the q269 bench before this expression existed). Here
  * the generated code is a single static call into the plain-JVM kernel
  * ([[graft.functions.Hilbert.hilbertIndexLocal]]), compiled once per
  * JVM, with `eval` sharing the same kernel — plan size and codegen
  * cost are independent of `bits`.
  *
  * Null contract: null in → null out (nullSafeEval). Inputs must be
  * longs in [0, 2^bits) — callers quantize first (the [[graft.functions.Hilbert]]
  * facade documents the contract); out-of-range bits above the grid are
  * simply ignored by the masking walk, matching the unrolled form.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  private val n: Int = 1 << bits

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.Hilbert.hilbertIndexLocal(
      n, l.asInstanceOf[Long].toInt, r.asInstanceOf[Long].toInt)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.Hilbert$$.MODULE$$.hilbertIndexLocal($n, (int) $x, (int) $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
