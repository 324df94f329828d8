package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the similarity hot path (SURVEY.md §4.3:
  * promote hot kernels to codegen'd Expressions only where the built-ins
  * genuinely can't express them efficiently).
  *
  * The composed form `aggregate(zip_with(a, b, (x, y) -> xd*yd), 0d, +)`
  * is evaluated through the higher-order-function machinery: one lambda
  * frame per element, boxed accumulator, materialized intermediate array.
  * At 100 TB the dot product runs per (candidate pair × dimension) — these
  * kernels do the identical left-to-right double fold in a single loop
  * over the primitive array data (no per-element allocation), so results
  * are BIT-IDENTICAL to the built-ins formulation (and to the DuckDB
  * oracle's list_reduce), just faster.
  *
  * Null semantics match the composed form exactly: null array, length
  * mismatch (zip_with pads → null element poisons the fold), or null
  * element ⇒ null result.
  */
abstract class FloatVecFold
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def kind: Int // 0 = dot, 1 = squared L2
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else FloatVecFold.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right), kind)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val la = left.genCode(ctx)
    val rb = right.genCode(ctx)
    val box = ctx.freshName("folded")
    val laF = isFloat(left).toString
    val rbF = isFloat(right).toString
    ev.copy(code =
      code"""
${la.code}
${rb.code}
boolean ${ev.isNull} = true;
double ${ev.value} = 0.0;
if (!${la.isNull} && !${rb.isNull}) {
  Double $box = graft.plans.FloatVecFold.compute(
    ${la.value}, ${rb.value}, $laF, $rbF, $kind);
  if ($box != null) { ${ev.isNull} = false; ${ev.value} = $box.doubleValue(); }
}""")
  }
}

object FloatVecFold {
  /** Left-to-right double fold; null on length mismatch or null element —
    * the exact semantics of the composed zip_with/aggregate form. */
  def compute(x: ArrayData, y: ArrayData, xF: Boolean, yF: Boolean,
      kind: Int): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val a = if (xF) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (yF) y.getFloat(i).toDouble else y.getDouble(i)
      if (kind == 0) acc += a * b
      else { val d = a - b; acc += d * d }
      i += 1
    }
    acc
  }
}

case class FloatVecDot(left: Expression, right: Expression) extends FloatVecFold {
  override protected def kind: Int = 0
  override def prettyName: String = "fvec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class FloatVecL2Sq(left: Expression, right: Expression) extends FloatVecFold {
  override protected def kind: Int = 1
  override def prettyName: String = "fvec_l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecKernels {
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(FloatVecDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    GraftBridge.column(FloatVecL2Sq(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
