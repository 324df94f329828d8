package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native bottom-k (KMV / theta-style) distinct sketch: `kmv_bottom_k(key)`
  * keeps the k smallest DISTINCT 60-bit hashes of the key seen in the
  * group. With h_k the k-th smallest, NDV ≈ (k−1)·2^60 / h_k — the classic
  * k-minimum-values order-statistics estimator (Bar-Yossef et al.); when
  * fewer than k distinct hashes exist the sketch IS the exact distinct set.
  *
  * As a DeclarativeAggregate every phase is existing codegen'd array
  * expressions: update inserts the row's hash into a ≤k sorted buffer
  * map-side (with a saturation guard so once the buffer holds k values,
  * rows hashing above the current k-th minimum cost one comparison and no
  * sort), merge is union+sort+truncate of two ≤k arrays. The shuffle
  * carries ONE ≤k-long array per group per partition regardless of row
  * count or NDV — the property the window formulation (distinct hashes +
  * per-group row_number) lacks at 100 TB, where NDV itself can be billions.
  * Unlike HLL ([[Hll64Agg]]) the state is an order statistic, so merged
  * sketches also answer set-expression estimates (union = merge;
  * intersection via inclusion–exclusion over the merged k-th minimum).
  *
  * Hash semantics are exactly [[graft.operators.Sketches]]': 60-bit md5
  * bucket hash of the key's string form, seed "kmv" — so a SQL oracle
  * reproduces every buffer element and estimate bit-for-bit. NULL keys are
  * skipped (count-distinct semantics ignore NULL).
  */
case class KmvBottomK(child: Expression, k: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  require(k >= 2, s"kmv_bottom_k needs k >= 2, got $k")

  override def prettyName: String = "kmv_bottom_k"
  // containsNull = true so merge/update rewrites (whose inferred element
  // nullability varies) stay write-compatible with the buffer slot
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  private lazy val buf = AttributeReference("buf", dataType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))

  private def unionTruncate(a: Expression, b: Expression): Expression =
    Slice(new SortArray(ArrayUnion(a, b)), Literal(1), Literal(k))

  override lazy val updateExpressions: Seq[Expression] = {
    val h = Md5Bucket60(Seq(Literal("kmv"), Cast(child, StringType)))
    // buffer saturated AND hash not below the current k-th minimum → no-op
    val skip = And(EqualTo(Size(buf), Literal(k)),
      GreaterThanOrEqual(h, ElementAt(buf, Literal(k))))
    Seq(If(Or(IsNull(child), skip), buf, unionTruncate(buf, CreateArray(Seq(h)))))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(unionTruncate(buf.left, buf.right))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}

object KmvBottomK {
  /** Column builder: `kmvBottomK(col, k)` usable anywhere an aggregate goes. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      new KmvBottomK(GraftBridge.expression(c), k).toAggregateExpression())
}
