package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Fixed-point base-2 logarithm — the cross-engine transcendental contract.
  *
  * IEEE `log()` differs in the last ulps across engines, which is why the
  * oracle gate bans transcendentals. This kernel sidesteps that: log2 of a
  * positive int64 computed with INTEGER arithmetic only, in units of
  * 2^-16 (so `log2fx(n) = round-ish(log2(n) * 65536)`):
  *
  *   1. exponent `e` = index of the highest set bit (exact);
  *   2. 30-bit mantissa `m = n` shifted into `[2^30, 2^31)` (exact shifts,
  *      truncating low bits for n > 2^30 — deterministic);
  *   3. fractional part from a 257-entry lookup table
  *      `LUT(i) = round(log2(1 + i/256) * 2^16)` indexed by the mantissa's
  *      top 8 fractional bits, linearly interpolated on the remaining 22
  *      bits with integer multiply + shift.
  *
  * Every step is exact integer arithmetic, so ANY engine replays it
  * bit-for-bit; the table is built once here and embedded verbatim in both
  * the Spark kernel and the generated DuckDB SQL
  * ([[graft.functions.FxLog.sqlCtes]]) — parity by construction. Absolute
  * accuracy vs true log2 is ~2e-5 (table granularity), which prices
  * BM25/entropy/PMI scores correctly to ~4 decimal digits; the CONTRACT is
  * the fixed-point function itself, not IEEE log.
  *
  * Reference analog: the quality/frequency scoring family around
  * /root/reference/orderly/clean/cleaner.py:318-396 has no log-based
  * scores at all (frequency pruning is its only signal); this kernel is
  * what unblocks the log-scored operators a pretraining pipeline needs.
  */
object FxLog2 {
  /** Output scale: log2 in units of 2^-FRAC_BITS. */
  val FRAC_BITS = 16

  /** LUT(i) = round(log2(1 + i/256) * 2^16), i = 0..256. Built with
    * driver-side floating point ONCE; both engines consume the same
    * literal values, so no runtime transcendental is ever evaluated. */
  val LUT: Array[Long] = Array.tabulate(257)(i =>
    math.round(math.log1p(i / 256.0) / math.log(2.0) * 65536.0))

  /** log2fx(n) for n >= 1 (callers guard; n <= 0 is the null path). */
  def log2fx(n: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = if (e >= 30) n >>> (e - 30) else n << (30 - e)
    val i = ((m >> 22) - 256).toInt
    e.toLong * 65536L + LUT(i) + ((LUT(i + 1) - LUT(i)) * (m & 4194303L) >> 22)
  }
}

/** Native codegen'd column form of [[FxLog2.log2fx]]: LongType → LongType,
  * null (or non-positive) input → null. Stays inside whole-stage codegen —
  * one static call, no boxing. A non-integral child is an ANALYSIS error
  * (checkInputDataTypes, same pattern as VecKernels), not a codegen-time
  * cast failure. */
case class FxLog2Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"log2fx requires an integral child, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "log2fx"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      // integral children narrower than long arrive boxed (e.g. a
      // foldable int literal constant-folded through this eval) —
      // widen via Number instead of a brittle Long cast
      val n = v.asInstanceOf[java.lang.Number].longValue()
      if (n <= 0L) null else FxLog2.log2fx(n)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
${c.code}
boolean ${ev.isNull} = true;
long ${ev.value} = 0L;
if (!${c.isNull} && ${c.value} > 0L) {
  ${ev.isNull} = false;
  ${ev.value} = graft.plans.FxLog2.log2fx(${c.value});
}""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-point base-2 EXPONENTIAL — [[FxLog2]]'s inverse, same contract.
  *
  * `exp2fx(x)` = 2^(x/2^16) in units of 2^-16, for 0 ≤ x < 46·2^16
  * (result < 2^63): integer exponent from the high bits, fractional
  * mantissa from a 257-entry `round(2^(i/256)·2^16)` table with integer
  * linear interpolation, shifted up by the exponent. Exact integer
  * arithmetic end-to-end, table embedded in both engines' forms
  * ([[graft.functions.FxLog.sqlExpCtes]]) — with [[FxLog2]] this closes
  * the log/exp pair, unlocking power-law reweighting (n^α via
  * exp2fx(α·log2fx(n))), softmax-style mixtures, and decay curves under
  * the oracle gate.
  */
object FxExp2 {
  /** Largest valid input (exclusive): 2^46 in 2^-16 units stays < 2^63. */
  val MAX_X: Long = 46L * 65536L

  /** LUT(i) = round(2^(i/256) * 2^16), i = 0..256. */
  val LUT: Array[Long] = Array.tabulate(257)(i =>
    math.round(math.pow(2.0, i / 256.0) * 65536.0))

  /** exp2fx(x) for 0 <= x < MAX_X (callers guard; else the null path). */
  def exp2fx(x: Long): Long = {
    val e = (x >> 16).toInt
    val f = x & 65535L
    val i = (f >> 8).toInt
    val m = LUT(i) + ((LUT(i + 1) - LUT(i)) * (f & 255L) >> 8)
    m << e
  }
}

/** Native codegen'd column form of [[FxExp2.exp2fx]]: LongType → LongType,
  * null (or out-of-domain) input → null. Non-integral child = analysis
  * error, as for [[FxLog2Expr]]. */
case class FxExp2Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"exp2fx requires an integral child, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "exp2fx"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val x = v.asInstanceOf[java.lang.Number].longValue()
      if (x < 0L || x >= FxExp2.MAX_X) null else FxExp2.exp2fx(x)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
${c.code}
boolean ${ev.isNull} = true;
long ${ev.value} = 0L;
if (!${c.isNull} && ${c.value} >= 0L && ${c.value} < ${FxExp2.MAX_X}L) {
  ${ev.isNull} = false;
  ${ev.value} = graft.plans.FxExp2.exp2fx(${c.value});
}""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
