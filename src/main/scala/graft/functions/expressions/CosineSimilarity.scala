package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two numeric arrays in
  * ONE fused loop, with whole-stage codegen (`doGenCode`).
  *
  * Why an Expression rather than the `zip_with`/`aggregate` higher-order
  * composition in [[graft.functions.VectorFunctions.cosine]]: HOFs
  * evaluate a boxed lambda per element and the cosine needs three array
  * traversals (dot, |a|, |b|) — measured ~0.5 ms/row at dim=64. This
  * expression compiles to a primitive `for` loop accumulating all three
  * sums at once.
  *
  * Numeric parity: each accumulator is its own left-to-right IEEE double
  * sum and the result is `dot / (sqrt(na) * sqrt(nb))` with 0.0 on zero
  * norms — bit-identical to both the HOF form and the DuckDB oracle SQL
  * (`list_sum(list_transform(list_zip(...)))`), so oracle checks are
  * unaffected by which implementation a query uses.
  *
  * Null contract: null input array → null result (nullSafeEval); array
  * ELEMENTS are assumed non-null (embedding vectors), matching the
  * reference data.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elementType(left).get, elementType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xa = get(a, i, ta); val xb = get(b, i, tb)
      dot += xa * xb; na += xa * xa; nb += xb * xb
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, i: String, t: DataType): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ta, tb) = (elementType(left).get, elementType(right).get)
      val (n, dot, na, nb, i, denom) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"), ctx.freshName("denom"))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xa = ${getter(a, i, ta)};
         |  double xb = ${getter(b, i, tb)};
         |  $dot += xa * xb; $na += xa * xa; $nb += xb * xb;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : ($dot / $denom);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
