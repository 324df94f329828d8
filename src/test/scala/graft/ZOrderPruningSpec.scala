package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order is only worth its sort if the written layout actually prunes:
  * parquet min/max stats must let a scan skip most row groups for a
  * predicate on EITHER clustered dimension. q74 verifies the key
  * arithmetic; this spec verifies the pruning itself, end to end, from
  * the scan node's own metrics — each written file is one row group at
  * this size, so rows emitted by the scan measure file/row-group skipping
  * directly.
  */
class ZOrderPruningSpec extends SparkSpec {

  /** Rows the parquet scan emitted (post row-group pruning, pre Filter). */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = finalPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec in:\n" + finalPlan)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups on both dimensions") {
    import spark.implicits._
    val bits = 8
    val n = 100000L
    // two independent uniform dimensions in [0, 256)
    val data = spark.range(n).select(
      col("id"),
      pmod(hash(col("id")), lit(256)).as("x"),
      pmod(hash(col("id") + 7919), lit(256)).as("y"))

    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_xsort_").toString
    Layout.clusterByZOrder(data, col("x"), col("y"), bits, 16)
      .write.mode("overwrite").parquet(zDir)
    // control: single-dimension clustering prunes x but cannot prune y
    data.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    val z = spark.read.parquet(zDir)
    val xs = spark.read.parquet(xDir)
    val total = z.count()
    assert(total == n)

    // predicate on x: both layouts prune
    val zX = scanOutputRows(z.filter(col("x") < 16))
    val xX = scanOutputRows(xs.filter(col("x") < 16))
    assert(zX < total / 2, s"z-order did not prune on x: $zX of $total")
    assert(xX < total / 2, s"x-sort did not prune on x: $xX of $total")

    // predicate on y: only the z-ordered layout prunes — the x-sorted
    // files each span the full y range, so the scan reads everything
    val zY = scanOutputRows(z.filter(col("y") < 16))
    val xY = scanOutputRows(xs.filter(col("y") < 16))
    assert(zY < total / 2, s"z-order did not prune on y: $zY of $total")
    assert(xY == total, s"control broken: x-sorted layout pruned y ($xY)")

    // pruning must not change answers
    assert(z.filter(col("y") < 16).count() == xs.filter(col("y") < 16).count())
    assert(z.filter(col("x") < 16).count() == xs.filter(col("x") < 16).count())
  }
}
