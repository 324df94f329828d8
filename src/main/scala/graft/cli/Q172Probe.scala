package graft.cli

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.Multimodal

/** Scratch A/B probe for q172's frame-decode stage: runs the exact q172
  * pipeline with the plain per-row decode vs the in-partition decode memo
  * vs generation-only (no hash), printing wall seconds for each — isolates
  * whether frame PNG GENERATION or DECODE dominates the 100× multimodal
  * rung, and what the memo actually buys. Dev tool, like [[DebugProbe]].
  */
object Q172Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    def frames(s: SparkSession): DataFrame =
      Tables.documents(s, dir)
        .withColumn("blen", length(col("text").cast("binary")).cast("int"))
        .withColumn("mp4", Multimodal.synthMp4(
          lit(600) + col("blen") % 5 * 100, (col("blen") * 3L).cast("long"),
          lit(1) + col("blen") % 3, col("blen") % 7 + 2, col("doc_id")))
        .withColumn("ns",
          Multimodal.videoInfo(col("mp4")).getField("nSamples").cast("int"))
        .select(col("doc_id"),
          explode(Multimodal.sampleFrameIdx(col("ns"), 3)).as("f"))
        .withColumn("payload", Multimodal.synthSplitPng(lit(64), lit(56),
          (((col("doc_id") + col("f")) % 7 + 1) * 8).cast("int"),
          col("doc_id") * 31 + col("f")))

    def time(label: String)(h: DataFrame => Column): Unit = {
      val t0 = System.nanoTime()
      val n = frames(spark).withColumn("h", h(frames(spark)))
        .agg(count(col("h")), sum(col("h") % 1000)).collect()(0)
      println(f"[q172probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"rows=${n.getLong(0)} chk=${n.get(1)}")
      System.gc()
    }

    // warm-up pass (JIT both codec paths)
    time("warmup-memo")(_ => Multimodal.averageHashMemo(col("payload"), 8, 7))
    time("gen-only")(_ => length(col("payload")).cast("long"))
    time("plain")(_ => Multimodal.averageHash(col("payload"), 8, 7))
    time("memo")(_ => Multimodal.averageHashMemo(col("payload"), 8, 7))
    time("plain2")(_ => Multimodal.averageHash(col("payload"), 8, 7))
    time("memo2")(_ => Multimodal.averageHashMemo(col("payload"), 8, 7))
    spark.stop()
  }
}
