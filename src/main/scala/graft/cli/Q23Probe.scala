package graft.cli

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.ArrayOps

/** Scratch timing probe for the q23 replacements-dict query (dev tool). */
object Q23Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def q = Tables.events(spark, dir)
      .select(ArrayOps.applyReplacements(col("event_type"),
        Map("click" -> "tap", "view" -> "impression")).as("mapped"))
      .groupBy("mapped").agg(count(lit(1)).as("cnt"))
    q.explain("formatted")
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      q.collect()
      println(f"[probe] q23 run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
