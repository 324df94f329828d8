package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel.
  *
  * Bit-identical to the composed form in [[graft.operators.Dedup.minhashSig]]
  * (one md5 per shingle via the [[Md5Bucket60]] contract, k xor-masked views,
  * elementwise running minimum seeded at Long.MaxValue — the formulation the
  * DuckDB oracle mirrors), but evaluated as one loop per row: the composed
  * `aggregate(transform(...), zip_with(...))` walks the higher-order-function
  * machinery per shingle AND allocates a fresh k-element accumulator array
  * per step; this kernel keeps one long[k] and calls the same static md5
  * routine directly. Null shingle elements hash like concat_ws semantics
  * (the null part is skipped → hash of the seed alone), matching the
  * composed form.
  */
case class MinHashSigExpr(child: Expression, seed: String, masks: Seq[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_sig"

  @transient private lazy val maskArr: Array[Long] = masks.toArray
  @transient private lazy val seedU8: UTF8String = UTF8String.fromString(seed)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashSigExpr.compute(v.asInstanceOf[ArrayData], seedU8, maskArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val maskRef = ctx.addReferenceObj("masks", maskArr, "long[]")
    val seedRef = ctx.addReferenceObj("seed", seedU8,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashSigExpr.compute($c, $seedRef, $maskRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  def compute(shingles: ArrayData, seed: UTF8String,
      masks: Array[Long]): ArrayData = {
    val k = masks.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val parts = new Array[UTF8String](2)
    parts(0) = seed
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      parts(1) =
        if (shingles.isNullAt(i)) null
        else shingles.getUTF8String(i)
      val h = Md5Bucket60.compute(parts)
      var j = 0
      while (j < k) {
        val m = h ^ masks(j)
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def apply(shingles: Column, seed: String, masks: Seq[Long]): Column =
    GraftBridge.column(new MinHashSigExpr(
      GraftBridge.expression(shingles), seed, masks))
}
