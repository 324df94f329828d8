package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** The Hilbert index is only a Hilbert index if it (a) visits every grid
  * cell exactly once and (b) steps to an ADJACENT cell every time — the
  * two properties that make its clustering locality strictly stronger
  * than Z-order's (Morton curves jump across the grid at power-of-two
  * seams). Both are checked exhaustively on the 16×16 grid through the
  * real Spark expression, then the write path is proven to prune scans on
  * either dimension, same end-to-end contract as ZOrderPruningSpec.
  */
class HilbertSpec extends SparkSpec {

  test("hilbert2 is a bijection onto [0, n^2) starting at the origin") {
    val order = 4
    val n = 1 << order
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val rows = grid
      .select(col("x"), col("y"), Layout.hilbert2(col("x"), col("y"), order).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).sorted.toSeq == (0L until n.toLong * n).toSeq,
      "indices are not a permutation of the cell count")
    val at0 = rows.find(_._3 == 0L).get
    assert((at0._1, at0._2) == (0L, 0L), s"curve does not start at origin: $at0")
  }

  test("consecutive hilbert indices are always unit-Manhattan neighbours") {
    val order = 4
    val n = 1 << order
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val byD = grid
      .select(Layout.hilbert2(col("x"), col("y"), order).as("d"), col("x"), col("y"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (0L until (n.toLong * n - 1)).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} jumps from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("scalar hilbertIndex equals the column expression on the full grid") {
    val order = 4
    val n = 1 << order
    val rows = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
      .select(col("x"), col("y"),
        Layout.hilbert2(col("x"), col("y"), order).as("d"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == Layout.hilbertIndex(order, r.getLong(0), r.getLong(1)),
        s"mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("hilbertBoxRanges covers exactly the box cells (random boxes, orders 4-6)") {
    val rnd = new scala.util.Random(20260813L)
    for (order <- 4 to 6; _ <- 1 to 20) {
      val n = 1 << order
      val x0 = rnd.nextInt(n); val x1 = x0 + rnd.nextInt(n - x0)
      val y0 = rnd.nextInt(n); val y1 = y0 + rnd.nextInt(n - y0)
      val rs = Layout.hilbertBoxRanges(order, x0, x1, y0, y1)
      // sorted, disjoint, merged
      rs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, s"unmerged: $rs")
        case _ => ()
      }
      val covered = rs.flatMap { case (lo, hi) => lo to hi }.toSet
      val box = (for (x <- x0.toLong to x1; y <- y0.toLong to y1)
        yield Layout.hilbertIndex(order, x, y)).toSet
      assert(covered == box,
        s"order=$order box=[$x0,$x1]x[$y0,$y1]: covered ${covered.size}, box ${box.size}")
    }
  }

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

  test("hilbert-clustered layout prunes row groups on both dimensions") {
    val order = 8
    val n = 100000L
    val data = spark.range(n).select(
      col("id"),
      pmod(hash(col("id")), lit(256)).as("x"),
      pmod(hash(col("id") + 7919), lit(256)).as("y"))

    val hDir = java.nio.file.Files.createTempDirectory("graft_hilbert_").toString
    Layout.clusterByHilbert(data, col("x"), col("y"), order, 16)
      .write.mode("overwrite").parquet(hDir)

    val h = spark.read.parquet(hDir)
    val total = h.count()
    assert(total == n)

    val hX = scanOutputRows(h.filter(col("x") < 16))
    val hY = scanOutputRows(h.filter(col("y") < 16))
    assert(hX < total / 2, s"hilbert did not prune on x: $hX of $total")
    assert(hY < total / 2, s"hilbert did not prune on y: $hY of $total")

    // pruning must not change answers
    assert(h.filter(col("x") < 16).count() == data.filter(col("x") < 16).count())
    assert(h.filter(col("y") < 16).count() == data.filter(col("y") < 16).count())
  }
}
