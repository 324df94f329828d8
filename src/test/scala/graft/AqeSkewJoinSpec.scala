package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join certification at the RUNTIME-plan level: q228 proves the
  * EXPLICIT salting tool is value-preserving under pathological skew;
  * this spec proves the AUTOMATIC path — Spark's OptimizeSkewedJoin —
  * actually fires under this engine's session configuration when a
  * sort-merge join meets a skewed partition, splitting the hot
  * partition instead of serializing it on one reducer. Together they
  * cover both 100 TB skew strategies the docs claim: AQE for moderate
  * skew, explicit salt for the pathological single-key case AQE's
  * per-PARTITION splitting cannot help (one giant KEY still lands whole
  * in each split).
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("OptimizeSkewedJoin splits the hot partition and preserves the result") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds lowered so test-sized data trips the skew detector:
      // a partition is "skewed" past 16 KB and 2x the median
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // forbid broadcast so the join stays sort-merge (the skew path)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // keep AQE from collapsing everything into one partition first
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~95% of left rows on key 0, with a fat payload so the hot
      // partition clears the byte threshold; right side is uniform
      val left = spark.range(0, 40000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 97)
          .as("k"),
          concat(lit("x"), lpad(col("id").cast("string"), 200, "p"))
            .as("payload"))
      val right = spark.range(0, 97).select(col("id").as("k"),
        (col("id") * 7).as("v"))
      val joined = left.join(right, "k")
      // execute THIS dataframe (an agg would be its own query execution
      // whose adaptive plan is separate), then read its runtime plan
      val rows = joined.collect()
      val got = (rows.length.toLong,
        rows.map(_.getString(1).length.toLong).sum,
        rows.map(_.getLong(2)).sum)
      // runtime plan: the final adaptive plan must carry a skew-split
      // sort-merge join (isSkewJoin renders as "skew=true")
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an AdaptiveSparkPlanExec root")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the sort-merge join as skew-split:\n" + finalPlan)
      // and the skew split must not change the result
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val p = left.join(right, "k")
        .agg(count(lit(1)), sum(length(col("payload"))), sum(col("v"))).head()
      val plain = (p.getLong(0), p.getLong(1), p.getLong(2))
      assert(got == plain, s"skew-join result drifted: $got vs $plain")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
