package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Layout.fanOut gate + width contract (r16):
  *   - fan ONLY a single-file source the scan cannot split to session
  *     width by itself;
  *   - width is a property of the input SIZE (bytes / bytesPerTask,
  *     capped at defaultParallelism), never bare session width;
  *   - a sharded corpus — however few its files — is returned UNTOUCHED
  *     (the r15 ADVICE hazard: 100 part files on a 512-core session must
  *     not round-robin-shuffle the whole table);
  *   - a single file big enough that maxPartitionBytes splits it to >=
  *     session width is returned untouched (never full-shuffle a large
  *     single file).
  */
class LayoutFanOutSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toFile.getAbsolutePath

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("single small file fans to byte-capped width with a round-robin exchange") {
    val dir = tmp("fanout-small")
    // md5 strings defeat compression so the single part file lands well
    // above one 64 KB task budget
    spark.range(0, 30000)
      .select(col("id"), md5(col("id").cast("string")).as("s"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.inputFiles.length == 1, df.inputFiles.toSeq)
    val bytes = new java.io.File(
      new java.net.URI(df.inputFiles(0)).getPath).length
    val para = spark.sparkContext.defaultParallelism
    val bpt = 64L << 10
    val expected = math.min(para.toLong, (bytes + bpt - 1) / bpt).toInt
    assert(expected >= 2, s"fixture too small to exercise the fan: $bytes bytes")
    val fanned = Layout.fanOut(df)
    assert(fanned.rdd.getNumPartitions == expected,
      s"width must be min(para=$para, ceil($bytes/$bpt))=$expected")
    assert(planOf(fanned).contains("RoundRobinPartitioning"),
      "fan-out must be a round-robin exchange:\n" + planOf(fanned))
  }

  test("width honors an explicit bytes-per-task budget") {
    val dir = tmp("fanout-bpt")
    spark.range(0, 30000)
      .select(col("id"), md5(col("id").cast("string")).as("s"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val bytes = new java.io.File(
      new java.net.URI(df.inputFiles(0)).getPath).length
    val para = spark.sparkContext.defaultParallelism
    val bpt = math.max(1L, bytes / 2) // force width ~2 regardless of size
    val expected = math.min(para.toLong, (bytes + bpt - 1) / bpt).toInt
    val fanned = Layout.fanOut(df, bpt)
    assert(fanned.rdd.getNumPartitions == expected)
  }

  test("sharded input is returned untouched even when files < session width") {
    val dir = tmp("fanout-sharded")
    spark.range(0, 1000).select(col("id"))
      .repartition(2).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    assert(df.inputFiles.length == 2, df.inputFiles.toSeq)
    assert(spark.sparkContext.defaultParallelism > 2)
    val fanned = Layout.fanOut(df)
    // untouched: same DataFrame reference, byte-identical plan
    assert(fanned eq df, "sharded corpus must not be shuffled")
    assert(planOf(fanned) == planOf(df))
  }

  test("a single file the scan itself splits to >= session width is untouched") {
    val dir = tmp("fanout-bigfile")
    spark.range(0, 30000)
      .select(col("id"), md5(col("id").cast("string")).as("s"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val bytes = new java.io.File(
      new java.net.URI(df.inputFiles(0)).getPath).length
    val para = spark.sparkContext.defaultParallelism
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // shrink the split size so this file counts as "big": the scan alone
      // yields >= para partitions, so fanOut must keep its hands off
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        math.max(1L, bytes / (para + 1)).toString)
      val fanned = Layout.fanOut(df)
      assert(fanned eq df,
        "a splittable-to-width single file must not be round-robin shuffled")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("a tiny single file (width < 2) is untouched") {
    val dir = tmp("fanout-tiny")
    spark.range(0, 10).select(col("id"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val fanned = Layout.fanOut(df)
    assert(fanned eq df, "a sub-64KB file buys no parallelism - no exchange")
  }
}
