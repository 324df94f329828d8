package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.plans.RewriteRangeJoinToBinned

/** The binned range join: the hand-spelled operator
  * ([[Relational.binnedIntervalJoin]]) and the optimizer rule
  * ([[RewriteRangeJoinToBinned]]) that rewrites a bare BETWEEN theta join
  * into the same shape. Both are checked value-equal to the nested-loop
  * answer on randomized data (negatives included — `div` truncation is
  * monotone, so binning stays correct below zero), and the rule's output
  * plan is checked nested-loop-free.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)
  private lazy val points = (0 until 400)
    .map(i => (i.toLong, rnd.nextLong(2000) - 1000)).toDF("pk", "p")
  private lazy val intervals = (0 until 300)
    .map { i =>
      val lo = rnd.nextLong(2000) - 1000
      (i.toLong, lo, lo + rnd.nextLong(40))
    }.toDF("ik", "lo", "hi")

  private def expected: Set[(Long, Long)] = {
    val ps = points.as[(Long, Long)].collect()
    val ivs = intervals.as[(Long, Long, Long)].collect()
    (for {
      (pk, p) <- ps; (ik, lo, hi) <- ivs
      if p >= lo && p <= hi
    } yield (pk, ik)).toSet
  }

  test("binnedIntervalJoin == nested loop (randomized, negatives)") {
    val got = Relational.binnedIntervalJoin(points, "p", intervals, "lo", "hi", 32L)
      .select(col("pk"), col("ik")).as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("optimizer rule turns a BETWEEN theta join into a hash equi-join") {
    // queryExecution memoizes on the DataFrame — build a fresh plan per probe
    def theta = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi"))
    // without the rule (conf unset): nested loop
    val before = theta.queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin"), before)

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteRangeJoinToBinned
    spark.conf.set("spark.graft.rangeJoin.binWidth", "32")
    try {
      val after = theta.queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin")
        && !after.contains("CartesianProduct"), after)
      assert(after.contains("Generate"), after) // interval replication present
      val got = theta.select(col("pk"), col("ik"))
        .as[(Long, Long)].collect().toSet
      assert(got == expected)

      // guards: an equi conjunct alongside the range → untouched (already
      // a hash join; also what makes the rule non-reentrant)
      val equi = points.join(intervals,
        col("pk") === col("ik") && col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("Generate"))
      // half-open range (single bound) → untouched
      val half = points.join(intervals, col("p") >= col("lo"))
      assert(!half.queryExecution.optimizedPlan.toString.contains("Generate"))
      // width unset → untouched
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      assert(theta.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations = prev
    }
  }

  test("q128 physical plan: no nested loop, no cartesian") {
    val df = graft.SparkEntry.queries("q128_binned_range_join")(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
