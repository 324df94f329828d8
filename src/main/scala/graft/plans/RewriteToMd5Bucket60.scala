package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: recognize the engine's PORTABLE hash formulation
  * `cast(conv(substring(md5(concat_ws('\u0001', parts…)), 1, 15), 16, 10)
  * as bigint)` — the form the DuckDB oracle runs and the form a user
  * migrating SQL text would write — and substitute the one-pass native
  * [[Md5Bucket60]] kernel (no hex string, no substring, no base-16 parse).
  *
  * Strictly semantics-preserving: Md5Bucket60Spec locks the two forms
  * bit-equal (including concat_ws null-skipping), so the rewrite changes
  * the physical work only. Injected via
  * [[GraftExtensions]]`.injectOptimizerRule` for sessions built with the
  * extension config; session-scoped opt-in for live sessions goes through
  * `spark.experimental.extraOptimizations`.
  */
object RewriteToMd5Bucket60 extends Rule[LogicalPlan] {

  private val Sep = UTF8String.fromString("\u0001")

  private def isIntLit(e: Expression, v: Int): Boolean = e match {
    case Literal(x: Int, IntegerType) => x == v
    case _ => false
  }

  /** md5's analyzed child is `cast(concat_ws(…) as binary)`. */
  private object AsConcatWs {
    def unapply(e: Expression): Option[Seq[Expression]] = e match {
      case ConcatWs(children) => Some(children)
      case Cast(ConcatWs(children), org.apache.spark.sql.types.BinaryType, _, _) =>
        Some(children)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Cast(Conv(Substring(Md5(AsConcatWs(sep +: parts)), pos, len),
            from, to, _), LongType, _, _)
          if (sep match {
            case Literal(s: UTF8String, StringType) => s == Sep
            case _ => false
          }) && isIntLit(pos, 1) && isIntLit(len, 15) &&
            isIntLit(from, 16) && isIntLit(to, 10) && parts.nonEmpty =>
        Md5Bucket60(parts)
    }
}
