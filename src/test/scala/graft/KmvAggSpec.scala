package graft

import org.apache.spark.sql.functions._

import graft.functions.XHash
import graft.operators.Sketches
import graft.plans.KmvBottomK

/** KmvBottomK: the native bottom-k sketch must equal the brute-force order
  * statistic (k smallest distinct hashes) on any partitioning, skip NULLs,
  * and reduce to an exact count below saturation. */
class KmvAggSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def bruteBottomK(keys: Seq[String], k: Int): Seq[Long] =
    keys.distinct.map(s => XHash.bucketHashJvm("kmv", s)).distinct.sorted.take(k)

  test("sketch equals brute-force bottom-k on every partitioning") {
    import spark.implicits._
    val keys = (1 to 500).map(i => s"user-${i % 137}")
    for (parts <- Seq(1, 3, 13)) {
      val got = spark.createDataset(keys).repartition(parts)
        .toDF("k")
        .agg(KmvBottomK(col("k"), 16).as("kmv"))
        .head().getList[Long](0).asScala.toSeq
      assert(got == bruteBottomK(keys, 16), s"parts=$parts")
    }
  }

  test("below saturation the sketch is the exact distinct hash set") {
    import spark.implicits._
    val keys = Seq("a", "b", "c", "b", "a")
    val got = spark.createDataset(keys).toDF("k")
      .agg(KmvBottomK(col("k"), 64).as("kmv"))
      .head().getList[Long](0).asScala.toSeq
    assert(got == bruteBottomK(keys, 64))
    assert(got.size == 3)
  }

  test("NULL keys are skipped") {
    import spark.implicits._
    val got = spark.createDataset(Seq(Some("a"), None, Some("b"), None))
      .toDF("k")
      .agg(KmvBottomK(col("k"), 8).as("kmv"))
      .head().getList[Long](0).asScala.toSeq
    assert(got == bruteBottomK(Seq("a", "b"), 8))
  }

  test("kmv_bottom_k and bottom_k are SQL-registered via GraftExtensions") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    spark.createDataset(Seq("a", "b", "a", "c")).toDF("k")
      .createOrReplaceTempView("kmv_sql_probe")
    val viaSql = spark.sql(
      "SELECT kmv_bottom_k(k, 8) AS s FROM kmv_sql_probe")
      .head().getList[Long](0).asScala.toSeq
    assert(viaSql == bruteBottomK(Seq("a", "b", "c"), 8))
    val topk = spark.sql(
      "SELECT bottom_k(length(k), 2) AS s FROM kmv_sql_probe")
      .head().getList[Int](0).asScala.toSeq
    assert(topk == Seq(1, 1))
  }

  test("grouped estimate is exact below k and within 3x sigma above") {
    import spark.implicits._
    // group "small": 10 distinct; group "big": 2000 distinct
    val rows = (1 to 10).map(i => ("small", s"s$i")) ++
      (1 to 2000).flatMap(i => Seq(("big", s"b$i")))
    val est = Sketches.kmvDistinctGrouped(
        rows.toDF("g", "k"), "g", col("k"), 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est("small") == ((10L, 10L)))
    val (bigEst, bigSize) = est("big")
    assert(bigSize == 64L)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 12.7% at k=64; allow 3 sigma
    assert(math.abs(bigEst - 2000L) < 2000 * 0.38, s"est=$bigEst")
  }
}
