package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The 100 TB storage-layout story, spec-locked on real plans:
  *
  *  - co-located joins: both fact tables written bucketed by the join key →
  *    the join plan contains NO Exchange (each bucket pair joins in place —
  *    at scale this removes the dominant shuffle of fact⋈fact joins);
  *  - partition pruning: a filter on the partition column must reach the
  *    scan as PartitionFilters, reading only matching directories.
  */
class BucketedTablesSpec extends SparkSpec {

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("bucketed fact-fact join plans without a shuffle") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
    def dropTable(name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // a stale warehouse dir (e.g. from a killed run) blocks re-creation
      val loc = java.nio.file.Paths.get("spark-warehouse", name)
      if (java.nio.file.Files.exists(loc)) {
        java.nio.file.Files.walk(loc)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    dropTable("li_bkt")
    dropTable("o_bkt")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bkt")

    // disable auto-broadcast so the plan exercises the bucketed merge path
    // (at real fact-table sizes neither side broadcasts anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val p = explain(joined)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle:\n" + p)

      // and the result is the same rows as the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition-pruned scan reads only the filtered directories") {
    val out = java.nio.file.Files.createTempDirectory("graft_part_").toString
    Tables.orders(spark, sf0001)
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("status") === "F")
    val p = explain(pruned)
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("status"), p)
    val expected = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == expected)
  }
}
