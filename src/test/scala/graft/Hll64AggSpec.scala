package graft

import org.apache.spark.sql.functions._
import graft.plans.Hll64Agg

/** The native one-pass HLL aggregate vs the composed explode+groupBy
  * pipeline: registers must match bit-for-bit, at any partitioning, with
  * NULLs skipped. */
class Hll64AggSpec extends SparkSpec {
  import spark.implicits._

  private def composedRegs(rows: Seq[(String, String)]): Map[String, Seq[Int]] = {
    val df = rows.toDF("g", "term")
    val regs = graft.operators.Sketches.hllRegistersGrouped(df, "g", "term")
      .as[(String, Long, Int)].collect()
    regs.groupBy(_._1).map { case (g, rs) =>
      val arr = Array.fill(64)(0)
      rs.foreach { case (_, reg, rank) => arr(reg.toInt) = rank }
      g -> arr.toSeq
    }
  }

  test("hll64_agg == composed registers, any partitioning, nulls skipped") {
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 3000).map(i =>
      (if (i % 3 == 0) "a" else "b", s"term${rnd.nextInt(700)}"))
    val expect = composedRegs(rows)
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "term").repartition(parts)
        // null rows must not touch the registers
        .unionByName(Seq(("a", null.asInstanceOf[String])).toDF("g", "term"))
      val got = df.groupBy("g").agg(Hll64Agg(col("term")).as("regs"))
        .as[(String, Seq[Int])].collect().toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("hll64_agg is callable from SQL text via the extension registration") {
    graft.plans.GraftExtensions.register(spark)
    Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("g", "term")
      .createOrReplaceTempView("hlltv")
    val viaSql = spark.sql(
      "SELECT g, hll64_agg(term) AS regs FROM hlltv GROUP BY g")
      .as[(String, Seq[Int])].collect().toMap
    val expect = composedRegs(Seq(("a", "x"), ("a", "y"), ("b", "x")))
    assert(viaSql == expect)
  }

  test("partial aggregation survives: plan shows two-phase hash aggregate") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("g", "term")
      .groupBy("g").agg(Hll64Agg(col("term")).as("regs"))
    val p = df.queryExecution.executedPlan.toString
    // partial_hll64_agg upstream of the exchange = map-side combine works
    assert(p.contains("partial_hll64_agg") || p.contains("partial hll64_agg")
      || p.contains("Partial"), p)
    // the packed 8-long fixed-width buffer must plan a HashAggregate (the
    // r12 array-typed buffer forced SortAggregate — a sort per micro-batch)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }
}
