package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass HLL-register aggregate: `hll64_agg(term)` returns the
  * 64-element max-rank register array that
  * [[graft.operators.Sketches.hllRegistersGrouped]] assembles from an
  * explode + two-level groupBy.
  *
  * Imperative form (r13; the r12 verdict's directive #2): the 64 one-byte
  * registers are packed into EIGHT long buffer slots, so the aggregation
  * buffer is fixed-width and mutable — Spark plans a HashAggregate (no
  * per-micro-batch sort of an array-typed buffer) and each input row costs
  * ONE md5 hash + ONE in-place word write (`buffer.setLong`), skipped
  * entirely when the register's current rank already dominates. The r12
  * DeclarativeAggregate form paid an O(64) `ArrayTransform` copy + fresh
  * array allocation per row — that constant was q239's 100×-ladder long
  * pole (38.0 s; q203's KMV on the same shape runs 7.4 s). Merge is a
  * per-byte max over the 8 words per (group, partition) pair; the shuffle
  * and the streaming state store carry 64 BYTES per group, fixed-width.
  *
  * Hash/rank semantics are exactly [[graft.operators.Sketches]]': 60-bit
  * md5 bucket hash seeded "hll", register = low 6 bits, rank = 55 − bitlen
  * of the top 54 bits (integer `bin()` length, no float log). NULL inputs
  * are skipped, matching what the explode-based pipeline never sees.
  * Registers are bit-identical to the composed form at any partitioning
  * (locked by Hll64AggSpec).
  */
case class Hll64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends ImperativeAggregate with UnaryLike[Expression] {

  private val numWords = 8 // 64 registers, 8 one-byte ranks per long word

  override def prettyName: String = "hll64_agg"
  // containsNull = true for exact schema compatibility with the r12
  // declarative form (downstream frames and specs saw this nullability)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq.tabulate(numWords)(i =>
      AttributeReference(s"regs$i", LongType, nullable = false)())
  override lazy val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())
  override def aggBufferSchema: StructType =
    DataTypeUtils.fromAttributes(aggBufferAttributes)

  // The row's key in string form — same implicit cast the declarative form
  // (and concat_ws in the composed pipeline) applied. Built lazily AFTER
  // BindReferences rewrites `child`, so eval sees bound ordinals; the
  // session timezone is pinned the way ResolveTimeZone would for
  // timestamp-typed keys.
  @transient private lazy val childAsString: Expression =
    Cast(child, StringType, Option(SQLConf.get.sessionLocalTimeZone))

  override def initialize(buffer: InternalRow): Unit = {
    var i = 0
    while (i < numWords) {
      buffer.setLong(mutableAggBufferOffset + i, 0L)
      i += 1
    }
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    val s = childAsString.eval(input).asInstanceOf[UTF8String]
    if (s != null) {
      val h = Md5Bucket60.computeSeeded(Hll64Agg.seedBytes, s)
      val reg = (h & 63L).toInt // h is a positive 60-bit value: & == pmod
      val v = h >>> 6
      // rank = 55 − bitlen(top 54 bits); bitlen(v) = 64 − nlz(v) for v > 0
      val rank = if (v == 0L) 55 else java.lang.Long.numberOfLeadingZeros(v) - 9
      val idx = mutableAggBufferOffset + (reg >> 3)
      val shift = (reg & 7) << 3
      val word = buffer.getLong(idx)
      if (rank > ((word >>> shift) & 0xffL).toInt) {
        buffer.setLong(idx, (word & ~(0xffL << shift)) | (rank.toLong << shift))
      }
    }
  }

  override def merge(buffer: InternalRow, inputBuffer: InternalRow): Unit = {
    var i = 0
    while (i < numWords) {
      val a = buffer.getLong(mutableAggBufferOffset + i)
      val b = inputBuffer.getLong(inputAggBufferOffset + i)
      if (a != b) {
        var out = 0L
        var shift = 0
        while (shift < 64) {
          val x = (a >>> shift) & 0xffL
          val y = (b >>> shift) & 0xffL
          out |= (if (x >= y) x else y) << shift
          shift += 8
        }
        buffer.setLong(mutableAggBufferOffset + i, out)
      }
      i += 1
    }
  }

  override def eval(buffer: InternalRow): Any = {
    val regs = new Array[Int](64)
    var reg = 0
    while (reg < 64) {
      val word = buffer.getLong(mutableAggBufferOffset + (reg >> 3))
      regs(reg) = ((word >>> ((reg & 7) << 3)) & 0xffL).toInt
      reg += 1
    }
    new GenericArrayData(regs)
  }

  override protected def withNewChildInternal(newChild: Expression): Hll64Agg =
    copy(child = newChild)
}

object Hll64Agg {
  private val seedBytes: Array[Byte] =
    "hll".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Column builder: `hll64(col)` usable anywhere an aggregate goes. */
  def apply(c: Column): Column =
    GraftBridge.column(
      new Hll64Agg(GraftBridge.expression(c)).toAggregateExpression())
}
