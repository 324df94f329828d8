package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: a point-in-interval join (`p >= lo AND p <= hi` with no
  * equi-key) plans as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * comparisons, the classic range-join scale-killer. This rule rewrites the
  * logical Join into the binned equi-join that
  * [[graft.operators.Relational.binnedIntervalJoin]] spells by hand:
  * intervals are replicated onto each `binWidth`-sized bin they overlap
  * (explode of `sequence(lo div W, hi div W)`), the point side projects its
  * single bin, and the join becomes a hash equi-join on the bin with the
  * original range predicate kept as a residual. Truncating division is
  * monotone in the dividend for a positive divisor, so `lo <= p <= hi`
  * implies `bin(lo) <= bin(p) <= bin(hi)` — every qualifying pair meets in
  * exactly the point's bin (no dedup needed), for negative values too.
  *
  * Strictly opt-in: fires only when `spark.graft.rangeJoin.binWidth` is set
  * to a positive long (the bin width in the point column's own units —
  * pick it near the typical interval span so interval replication stays
  * ~2×). Scoped narrowly: INNER join, condition's bound conjuncts integral
  * -typed, no existing cross-side equi conjunct (those already hash-join;
  * the guard also makes the rule non-reentrant on its own output). Extra
  * conjuncts ride along as residuals. The Databricks/Photon "range join
  * optimization" and the interval-bin technique in postgres/timescale are
  * the public precedents (BASELINE.md §perf).
  */
object RewriteRangeJoinToBinned extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangeJoin.binWidth"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** (point expr, lower bound) of `p >= lo` in either spelling. */
  private object Ge {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "0").toLong
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        val crossSide = conjuncts.filter(c =>
          c.references.intersect(left.outputSet).nonEmpty &&
            c.references.intersect(right.outputSet).nonEmpty)
        val hasEqui = crossSide.exists {
          case EqualTo(_, _) | EqualNullSafe(_, _) => true
          case _ => false
        }
        // one side resolves an expression entirely
        def sideOf(e: Expression): Option[LogicalPlan] =
          if (e.references.subsetOf(left.outputSet)) Some(left)
          else if (e.references.subsetOf(right.outputSet)) Some(right)
          else None
        // each range conjunct normalized to (big, small) meaning big >= small
        val range = crossSide.collect {
          case c @ Ge(a, b) if integral(a) && integral(b) &&
              c.deterministic && sideOf(a).nonEmpty && sideOf(b).nonEmpty &&
              sideOf(a) != sideOf(b) => (a, b)
        }
        // the point expr is the one shared by both conjuncts: big in the
        // lower bound (p >= lo), small in the upper bound (hi >= p)
        val matched = Option.when(!hasEqui && range.size == 2) {
          val Seq((b1, s1), (b2, s2)) = range
          if (b1.semanticEquals(s2)) Some((b1, s1, b2)) // (p, lo, hi)
          else if (s1.semanticEquals(b2)) Some((s1, s2, b1))
          else None
        }.flatten.filter { case (p, lo, hi) =>
          sideOf(lo) == sideOf(hi) && sideOf(lo) != sideOf(p)
        }
        val rewritten = matched.map { case (p1, lo, hi) =>
          val w = Literal(width)
          val pointSide = sideOf(p1).get
          val ivSide = sideOf(lo).get
          val pBin = Alias(IntegralDivide(asLong(p1), w), "__pbin")()
          val newPoint = Project(pointSide.output :+ pBin, pointSide)
          // Sequence is TimeZoneAwareExpression: without an explicit zone it
          // reports unresolved and the optimizer rejects the plan
          val gen = Explode(Sequence(
            IntegralDivide(asLong(lo), w), IntegralDivide(asLong(hi), w),
            None, Some(conf.sessionLocalTimeZone)))
          val elem = gen.elementSchema.fields.head
          val iBin = AttributeReference(elem.name, elem.dataType, elem.nullable)()
          val newIv = Generate(gen, unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(iBin), child = ivSide)
          val newCond = (EqualTo(pBin.toAttribute, iBin) +: conjuncts).reduce(And)
          val (nl, nr) =
            if (pointSide eq left) (newPoint, newIv) else (newIv, newPoint)
          Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
        rewritten.getOrElse(j)
    }
  }
}
