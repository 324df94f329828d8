package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-shingle kernel.
  *
  * Bit-identical to the composed form in
  * the test-side ReferenceKernels.wordShinglesReference — n-token windows joined
  * with single spaces, `array_distinct` first-occurrence order, whole-list
  * fallback for short docs — which the DuckDB oracle mirrors
  * (list_distinct/list_transform). The composed form allocates a slice
  * array and walks the higher-order-function machinery per position; this
  * kernel builds each shingle string in one pass and dedupes with one
  * insertion-ordered set. array_join null semantics preserved (null tokens
  * are skipped, no separator doubling).
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  // NULL input ⇒ [null]: the composed form's `when` condition is null, so
  // the otherwise-branch yields array(array_join(NULL)) = [null]. The
  // kernel must match that, so the result is never null and may contain
  // one null element.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShinglesExpr.nullSingleton
    else ShinglesExpr.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code =
        code"""
${c.code}
$arrCls ${ev.value} = ${c.isNull}
  ? graft.plans.ShinglesExpr.nullSingleton()
  : graft.plans.ShinglesExpr.compute(${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {
  private val SPACE = UTF8String.fromString(" ")

  /** The [null] result for a NULL input array (see dataType note). */
  def nullSingleton(): ArrayData = new GenericArrayData(Array[Any](null))

  /** Join toks[from, from+len) with spaces, skipping nulls (array_join). */
  private def join(toks: ArrayData, from: Int, len: Int): UTF8String = {
    val parts = new java.util.ArrayList[UTF8String](len)
    var i = from
    val end = from + len
    while (i < end) {
      if (!toks.isNullAt(i)) parts.add(toks.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(SPACE, parts.toArray(new Array[UTF8String](parts.size())): _*)
  }

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array[Any](join(toks, 0, len)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    val last = len - n
    while (i <= last) {
      seen.add(join(toks, i, n))
      i += 1
    }
    new GenericArrayData(
      seen.toArray(new Array[UTF8String](seen.size())).asInstanceOf[Array[AnyRef]])
  }

  def apply(toks: Column, n: Int): Column =
    GraftBridge.column(new ShinglesExpr(GraftBridge.expression(toks), n))
}
