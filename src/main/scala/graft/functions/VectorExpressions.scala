package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product.
  *
  * Why a custom `Expression` (SURVEY §4.2 records that reference parity
  * needs none — this serves the extension tier): the expression-based
  * similarity paths otherwise choose between interpreted higher-order
  * functions (slow per element) or a `dim`-unrolled add-chain (hundreds of
  * plan nodes per use, which measurably bloats optimization and codegen).
  * `DotProduct` is ONE plan node whose `doGenCode` emits a tight Java loop
  * inside whole-stage codegen.
  *
  * Numeric contract (the cross-engine determinism rule the oracle relies
  * on): floats are widened to double and accumulated LEFT TO RIGHT in index
  * order — bit-identical to [[graft.ops.SimilarityOps.dotU]], the HOF fold,
  * the mapPartitions kernels, and a sequential SQL `list_sum`.
  *
  * Nulls: null input array → null result (BinaryExpression null-safe
  * contract). Null ELEMENTS are not expected (embedding columns), and the
  * type check rejects nothing at runtime — elements read as primitive
  * floats. Mismatched lengths dot the common prefix.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // each side may be array<float> or array<double> (e.g. a float embedding
  // against a double hyperplane literal); floats widen to double exactly,
  // so mixed-type results equal the all-double HOF fold bit-for-bit
  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f expects (array<float|double>, array<float|double>), got (${left.dataType.sql}, ${right.dataType.sql})")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, float: Boolean) =
        if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, isFloat(left))} * ${get(b, isFloat(right))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f"
}

object VectorExpressions {
  import org.apache.spark.sql.graft.bridge
  /** Column wrapper for [[DotProduct]]. */
  def dotF(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
}
