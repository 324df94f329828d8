package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native one-pass HLL-register aggregate: `hll64_agg(term)` returns the
  * 64-element max-rank register array that
  * [[graft.operators.Sketches.hllRegistersGrouped]] assembles from an
  * explode + two-level groupBy. As a DeclarativeAggregate every phase is
  * existing codegen'd expressions — update folds each input row into the
  * 64-int buffer map-side (partial aggregation), merge is an elementwise
  * max (`zip_with`), so the shuffle carries ONE 64-int array per group per
  * partition and the (group, term) pairs never exchange at all — one
  * full aggregation step cheaper than the composed form, same registers
  * bit-for-bit (locked by Hll64AggSpec).
  *
  * Hash/rank semantics are exactly [[graft.operators.Sketches]]': 60-bit
  * md5 bucket hash seeded "hll", register = low 6 bits, rank = 55 − bitlen
  * of the top 54 bits (integer `bin()` length, no float log). NULL inputs
  * are skipped, matching what the explode-based pipeline never sees.
  */
case class Hll64Agg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private val m = 64

  override def prettyName: String = "hll64_agg"
  // containsNull = true so merge/update rewrites (whose inferred element
  // nullability varies) stay write-compatible with the buffer slot
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false

  private lazy val regs = AttributeReference("regs", dataType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(regs)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Array.fill(m)(0), ArrayType(IntegerType, containsNull = false)))

  override lazy val updateExpressions: Seq[Expression] = {
    val h = Md5Bucket60(Seq(Literal("hll"), Cast(child, StringType)))
    val reg = Cast(Pmod(h, Literal(m.toLong)), IntegerType)
    val v = ShiftRight(h, Literal(6))
    val rank = If(EqualTo(v, Literal(0L)), Literal(55),
      Subtract(Literal(55), Length(Bin(v))))
    val x = NamedLambdaVariable("x", IntegerType, nullable = false)
    val i = NamedLambdaVariable("i", IntegerType, nullable = false)
    val updated = ArrayTransform(regs,
      LambdaFunction(If(EqualTo(i, reg), Greatest(Seq(x, rank)), x), Seq(x, i)))
    Seq(If(IsNull(child), regs, updated))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val a = NamedLambdaVariable("a", IntegerType, nullable = false)
    val b = NamedLambdaVariable("b", IntegerType, nullable = false)
    Seq(ZipWith(regs.left, regs.right,
      LambdaFunction(Greatest(Seq(a, b)), Seq(a, b))))
  }

  override lazy val evaluateExpression: Expression = regs

  override protected def withNewChildInternal(newChild: Expression): Hll64Agg =
    copy(child = newChild)
}

object Hll64Agg {
  /** Column builder: `hll64(col)` usable anywhere an aggregate goes. */
  def apply(c: Column): Column =
    GraftBridge.column(
      new Hll64Agg(GraftBridge.expression(c)).toAggregateExpression())
}
