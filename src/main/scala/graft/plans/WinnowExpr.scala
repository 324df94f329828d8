package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-fingerprint kernel (Schleimer et al. 2003 — see
  * [[graft.operators.TextOps.winnow]] for the algorithm contract).
  *
  * Bit-identical to the composed form kept in the test-side
  * ReferenceKernels.winnowReference — k-token grams joined with single
  * spaces (null tokens skipped, array_join semantics), each gram hashed
  * with the [[Md5Bucket60]] 60-bit contract under the given seed, window
  * minima of `w` consecutive hashes, first-occurrence-ordered distinct;
  * short docs (≤ w grams) yield the single global minimum, fewer than k
  * tokens (or a NULL array) yield the empty set.
  *
  * The composed form walks the interpreted higher-order-function machinery:
  * a slice allocation and an array_min scan per window position, and the
  * gram hash array can only be shared across windows through a lambda
  * rebinding. This kernel hashes each gram once and keeps the window
  * minima with a monotonic deque — O(grams) total, one loop, no per-window
  * allocation (3.5 s → sub-second for the q80 scan at sf0.1).
  */
case class WinnowExpr(child: Expression, seed: String, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "winnow_fingerprints"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WinnowExpr.emptyResult()
    else WinnowExpr.compute(v.asInstanceOf[ArrayData], seed, k, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    val seedRef = ctx.addReferenceObj("winnowSeed", seed, "java.lang.String")
    ev.copy(
      code =
        code"""
${c.code}
$arrCls ${ev.value} = ${c.isNull}
  ? graft.plans.WinnowExpr.emptyResult()
  : graft.plans.WinnowExpr.compute(${c.value}, $seedRef, $k, $w);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpr {
  private val SPACE = UTF8String.fromString(" ")

  def emptyResult(): ArrayData = new GenericArrayData(Array.emptyLongArray)

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

  def compute(toks: ArrayData, seed: String, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return emptyResult() // ngrams' short-doc empty set
    val ng = n - k + 1
    val hs = new Array[Long](ng)
    val parts = new Array[UTF8String](2)
    parts(0) = UTF8String.fromString(seed)
    var i = 0
    while (i < ng) {
      parts(1) = join(toks, i, k)
      hs(i) = Md5Bucket60.compute(parts)
      i += 1
    }
    if (ng <= w) {
      var m = hs(0)
      var j = 1
      while (j < ng) { if (hs(j) < m) m = hs(j); j += 1 }
      return new GenericArrayData(Array(m))
    }
    // sliding minima via a monotonic index deque; first-occurrence distinct
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Integer]()
    var p = 0
    while (p < ng) {
      while (!deque.isEmpty && hs(deque.peekLast()) >= hs(p)) deque.pollLast()
      deque.addLast(p)
      while (deque.peekFirst() <= p - w) deque.pollFirst()
      if (p >= w - 1) seen.add(hs(deque.peekFirst()))
      p += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  def apply(toks: Column, seed: String, k: Int, w: Int): Column =
    GraftBridge.column(new WinnowExpr(GraftBridge.expression(toks), seed, k, w))
}
