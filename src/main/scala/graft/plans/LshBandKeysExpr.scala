package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native banded-LSH key kernel — drop-in for the composed
  * [[graft.operators.Similarity.lshBandKeys]] form (bands × bitsPerBand
  * sign-of-dot-product bits, each band emitted as a `"b:bits"` string).
  *
  * Why native: the composed form builds bands·r separate expressions,
  * each of which SLICES the 64-double hyperplane weight literal to the
  * vector's length (one fresh ArrayData allocation per plane per row)
  * before the dot kernel runs — at adaptive 100×-corpus geometry
  * (r = 13+, b = 6+) that is ~80 slice allocations and expression-tree
  * dispatches per row on what is, at 100 TB, the banded-dedup signature
  * pass over every vector. This kernel hoists the weights into one
  * per-(planes, dims) primitive double matrix (cached process-wide;
  * values come from the same deterministic [[graft.operators.Similarity
  * .planeWeightConst]] hash) and computes all bands·r dots in one loop
  * nest with zero per-row allocation beyond the output array.
  *
  * Bit-identical to the composed form (locked by LshBandKeysKernelSpec):
  * per plane, the dot is the same left-to-right double fold over
  * min(len, dims) elements... precisely: the weight literal is sliced to
  * `size(vec)`, so len > dims gives a length MISMATCH (null dot → bit 0),
  * len ≤ dims folds exactly len terms, a null element nulls the dot
  * (bit 0), an empty vector folds to 0.0 (≥ 0 → bit 1), and a NULL
  * vector yields null dots for every plane — bits all 0, keys "b:0" —
  * never a null output array.
  */
case class LshBandKeysExpr(child: Expression, planes: Int, bands: Int,
    maxDims: Int = 64) extends UnaryExpression {
  require(bands >= 1 && planes >= bands && planes % bands == 0,
    s"planes must be a positive multiple of bands, got $planes/$bands")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>/array<double> input, got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // a NULL input vector still produces the all-zero-bits keys (the
  // composed form's when(null >= 0, ...).otherwise(0) semantics)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_band_keys"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    LshBandKeysExpr.compute(v.asInstanceOf[ArrayData], planes, bands,
      maxDims, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
${c.code}
org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
  graft.plans.LshBandKeysExpr.compute(
    ${c.isNull} ? null : ${c.value}, $planes, $bands, $maxDims, $isFloat);
""", isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandKeysExpr {

  // (planes, maxDims) → planes×maxDims weight matrix; tiny (≤ 40·64
  // doubles per geometry) and deterministic, so a process-wide cache is
  // safe across sessions and executor task threads
  private val weightCache =
    new ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def weights(planes: Int, maxDims: Int): Array[Array[Double]] =
    weightCache.computeIfAbsent((planes, maxDims), { key =>
      val (p, d) = key
      Array.tabulate(p, d)((pp, dd) =>
        graft.operators.Similarity.planeWeightConst(pp, dd))
    })

  /** All band keys for one vector; `vec` may be null (→ all-zero bits). */
  def compute(vec: ArrayData, planes: Int, bands: Int, maxDims: Int,
      isFloat: Boolean): ArrayData = {
    val w = weights(planes, maxDims)
    val r = planes / bands
    val n = if (vec == null) -1 else vec.numElements()
    // len > maxDims ⇒ the sliced weight literal would mismatch ⇒ every
    // dot is null ⇒ all bits 0 (same as a null vector)
    val usable = vec != null && n <= maxDims
    val keys = new Array[UTF8String](bands)
    var b = 0
    while (b < bands) {
      var bits = 0L
      var j = 0
      while (j < r) {
        if (usable) {
          val wp = w(b * r + j)
          var s = 0.0
          var ok = true
          var i = 0
          while (ok && i < n) {
            if (vec.isNullAt(i)) ok = false
            else {
              val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
              s += x * wp(i)
              i += 1
            }
          }
          // Spark's GreaterThanOrEqual uses the SQL ordering where NaN
          // sorts ABOVE every number, so the composed when(dot >= 0, …)
          // sets the bit for a NaN dot — Java's `>=` is false for NaN
          // and would silently diverge (spec-locked with NaN vectors)
          if (ok && (s >= 0 || java.lang.Double.isNaN(s))) bits |= 1L << j
        }
        j += 1
      }
      keys(b) = UTF8String.fromString(b.toString + ":" + bits.toString)
      b += 1
    }
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }
}

object LshKernels {
  /** Banded LSH keys via the native kernel — same contract as the
    * composed [[graft.operators.Similarity.lshBandKeys]] form. */
  def lshBandKeys(vec: Column, planes: Int, bands: Int,
      maxDims: Int = 64): Column =
    GraftBridge.column(LshBandKeysExpr(
      GraftBridge.expression(vec), planes, bands, maxDims))
}
