package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's deterministic 60-bit hash
  * (SURVEY.md §4.3: promote hot scalar kernels from composed built-ins to a
  * codegen'd Expression).
  *
  * Semantically identical to
  * `conv(substring(md5(concat_ws('\u0001', parts…)), 1, 15), 16, 10)` —
  * the [[graft.functions.XHash.bucketHash]] contract that the DuckDB oracle
  * reproduces — but evaluated in one pass over the digest bytes: no hex
  * string materialization, no substring, no base-16 parse. `concat_ws`
  * null semantics preserved (null parts are skipped, result is never null).
  */
case class Md5Bucket60(children: Seq[Expression])
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "md5bucket60"

  override def eval(input: InternalRow): Any = {
    val parts = new Array[UTF8String](children.length)
    var i = 0
    while (i < children.length) {
      parts(i) = children(i).eval(input).asInstanceOf[UTF8String]
      i += 1
    }
    Md5Bucket60.compute(parts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val partsVar = ctx.freshName("parts")
    val evals = children.map(_.genCode(ctx))
    val n = children.length.toString
    val assigns = evals.zipWithIndex.map { case (e, i) =>
      val idx = i.toString
      code"""
${e.code}
$partsVar[$idx] = ${e.isNull} ? null : ${e.value};"""
    }.reduce(_ + _)
    ev.copy(
      code =
        code"""
UTF8String[] $partsVar = new UTF8String[$n];
$assigns
long ${ev.value} = graft.plans.Md5Bucket60.compute($partsVar);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object Md5Bucket60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SEP = Array[Byte](1)

  /** First 60 bits of md5(join-non-null-parts-with-\u0001), as a positive
    * long — equals `conv(substring(hex, 1, 15), 16, 10)`. */
  def compute(parts: Array[UTF8String]): Long = {
    val d = md.get()
    d.reset()
    var first = true
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p != null) {
        if (!first) d.update(SEP)
        d.update(p.getBytes)
        first = false
      }
      i += 1
    }
    fold60(d.digest())
  }

  /** `compute(Array(seedUtf8, s))` for non-null `s`, without the per-call
    * array allocation — the two-part seeded form the sketch aggregates
    * ([[Hll64Agg]]) hash once per input row. `seedBytes` is the seed's
    * UTF-8 bytes, precomputed once by the caller. */
  def computeSeeded(seedBytes: Array[Byte], s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    d.update(seedBytes)
    d.update(SEP)
    d.update(s.getBytes)
    fold60(d.digest())
  }

  // 15 hex chars = bytes 0..6 plus the high nibble of byte 7
  private def fold60(h: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
    (v << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  /** Column builder — drop-in for the composed-built-ins formulation
    * (including concat_ws's implicit cast of non-string inputs). */
  def apply(cols: Column*): Column =
    GraftBridge.column(Md5Bucket60(
      cols.map(c => GraftBridge.expression(
        c.cast(org.apache.spark.sql.types.StringType)))))
}
