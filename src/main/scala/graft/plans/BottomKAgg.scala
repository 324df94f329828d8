package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Native grouped bottom-k aggregate: `bottom_k(expr, k)` keeps the k
  * smallest values of any orderable child (rank a struct's leading fields
  * to get "top-k by X, tie-broken by Y" — negate X for descending).
  *
  * This is the window-free grouped top-k: `row_number() OVER (PARTITION BY
  * g ORDER BY v) <= k` shuffles EVERY row of every group to a sort, while
  * this aggregate folds map-side to a ≤k sorted buffer per partition and
  * shuffles one ≤k array per group per partition — for small k the shuffle
  * shrinks by the group's row count, the shape that survives a hot group
  * at 100 TB. (Spark's WindowGroupLimit pushdown recovers map-side
  * pruning for the window form, but still sorts per partition and keeps
  * the row_number stage; the aggregate is a plain hash-agg.)
  *
  * Unlike [[KmvBottomK]] the buffer concatenates rather than set-unions:
  * duplicate values are real rows and must all count toward the k. The
  * saturation guard keeps the per-row cost at one comparison once the
  * buffer holds k values. NULL children are skipped — and for a STRUCT
  * child, so are rows where any of the first `rankFields` top-level
  * fields is NULL: a struct with a NULL leading rank field is not itself
  * null, would sort nulls-FIRST in the buffer, and diverge from the
  * window formulation's `ORDER BY x DESC` (nulls LAST) — skipping keeps
  * the aggregate equivalent to a window over `WHERE rank keys IS NOT
  * NULL` on nullable inputs. `rankFields` defaults to ALL fields; a
  * caller packing nullable PAYLOAD fields after the rank keys (the q199
  * carry-extra-columns pattern) must pass the rank-key count explicitly
  * or those rows are dropped even when their rank keys are present.
  */
case class BottomKAgg(child: Expression, k: Int,
    rankFields: Int = Int.MaxValue)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  require(k >= 1, s"bottom_k needs k >= 1, got $k")
  require(rankFields >= 1, s"bottom_k needs rankFields >= 1, got $rankFields")

  override def prettyName: String = "bottom_k"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = true)
  override def nullable: Boolean = false

  private lazy val buf = AttributeReference("buf", dataType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Seq.empty, ArrayType(child.dataType, containsNull = false)))

  private def truncate(merged: Expression): Expression =
    Slice(new SortArray(merged), Literal(1), Literal(k))

  /** Null guard: the child itself, or (struct child) any of the first
    * `rankFields` top-level fields — ordering-significant keys only, so a
    * NULL in a trailing payload field no longer drops the row. */
  private lazy val anyNull: Expression = child.dataType match {
    case st: StructType =>
      st.fields.zipWithIndex.take(rankFields)
        .map { case (f, i) =>
          IsNull(GetStructField(child, i, Some(f.name))): Expression }
        .foldLeft(IsNull(child): Expression)(Or(_, _))
    case _ => IsNull(child)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = And(EqualTo(Size(buf), Literal(k)),
      GreaterThanOrEqual(child, ElementAt(buf, Literal(k))))
    Seq(If(Or(anyNull, skip), buf,
      truncate(Concat(Seq(buf, CreateArray(Seq(child)))))))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(truncate(Concat(Seq(buf.left, buf.right))))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(newChild: Expression): BottomKAgg =
    copy(child = newChild)
}

object BottomKAgg {
  /** Column builder: `bottomK(col, k)` usable anywhere an aggregate goes.
    * For a STRUCT child the null guard spans ALL top-level fields — rows
    * with any NULL field are skipped; pack nullable payload fields only
    * via the 3-arg overload with the rank-key count. */
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      new BottomKAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** As above, but the NULL-skip guard covers only the first `rankFields`
    * struct fields (the ordering-significant keys): trailing nullable
    * payload fields ride along without dropping their rows. */
  def apply(c: Column, k: Int, rankFields: Int): Column =
    GraftBridge.column(
      new BottomKAgg(GraftBridge.expression(c), k, rankFields)
        .toAggregateExpression())
}
