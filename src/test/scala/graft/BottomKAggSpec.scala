package graft

import org.apache.spark.sql.functions._

import graft.plans.BottomKAgg

/** BottomKAgg: must equal the brute-force k-smallest (duplicates KEPT —
  * unlike KmvBottomK's set semantics) on any partitioning, skip NULLs,
  * and reproduce window top-k semantics on structs. */
class BottomKAggSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("bottom-k keeps duplicates and matches brute force on any partitioning") {
    import spark.implicits._
    val vs: Seq[Long] = Seq(5L, 1L, 3L, 1L, 9L, 1L, 3L, 7L, 2L)
    for (parts <- Seq(1, 2, 5)) {
      val got = spark.createDataset(vs).repartition(parts).toDF("v")
        .agg(BottomKAgg(col("v"), 4).as("b"))
        .head().getList[Long](0).asScala.toSeq
      assert(got == vs.sorted.take(4), s"parts=$parts")
    }
  }

  test("NULLs are skipped; under-full buffer returns all values sorted") {
    import spark.implicits._
    val got = spark.createDataset(Seq[Option[Long]](Some(4L), None, Some(2L)))
      .toDF("v")
      .agg(BottomKAgg(col("v"), 10).as("b"))
      .head().getList[Long](0).asScala.toSeq
    assert(got == Seq(2L, 4L))
  }

  test("struct rows with a NULL rank field are skipped, not sorted first") {
    import spark.implicits._
    // a struct whose leading field is NULL is NOT itself null; unguarded
    // it would insert and sort nulls-first, diverging from the window
    // formulation's ORDER BY ... (nulls last) — r8 advice item
    val rows = Seq((1L, Some(10L)), (2L, None), (3L, Some(5L)), (4L, None))
      .toDF("id", "v")
    val got = rows
      .agg(BottomKAgg(struct((-col("v")).as("nv"), col("id").as("id")), 3)
        .as("b"))
      .select(explode(col("b")))
      .select(col("col.id")).as[Long].collect().toSeq
    assert(got == Seq(1L, 3L)) // only non-null ranks, best (10) first
  }

  test("rankFields confines the NULL guard to the ordering keys") {
    import spark.implicits._
    // q199 carry-extra-columns pattern: rank by (nv, id), carry a NULLABLE
    // payload. With rankFields=2 the NULL payload rides along; the 2-arg
    // (all-fields) form drops those rows — both behaviors spec-locked.
    val rows = Seq((1L, 10L, Some("x")), (2L, 30L, None), (3L, 20L, Some("y")))
      .toDF("id", "v", "payload")
    val packed = struct((-col("v")).as("nv"), col("id").as("id"),
      col("payload").as("payload"))
    val scoped = rows.agg(BottomKAgg(packed, 2, 2).as("b"))
      .select(explode(col("b"))).select(col("col.id")).as[Long]
      .collect().toSeq
    assert(scoped == Seq(2L, 3L)) // NULL payload row kept, ranked by v desc
    val allFields = rows.agg(BottomKAgg(packed, 2).as("b"))
      .select(explode(col("b"))).select(col("col.id")).as[Long]
      .collect().toSeq
    assert(allFields == Seq(3L, 1L)) // NULL payload row dropped
  }

  test("bottom_k folds inside streaming aggregation state (Complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(String, Long)]
    in.addData(("a", 5L), ("a", 1L), ("b", 9L))
    in.addData(("a", 3L), ("a", 1L), ("b", 2L))
    val q = in.toDF().toDF("g", "v")
      .groupBy("g").agg(BottomKAgg(col("v"), 2).as("b"))
      .writeStream.format("memory").queryName("bk_stream")
      .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("bk_stream").collect()
      .map(r => r.getString(0) -> r.getList[Long](1).asScala.toSeq).toMap
    // duplicates kept across micro-batches; state merged like partials
    assert(got == Map("a" -> Seq(1L, 1L), "b" -> Seq(2L, 9L)))
  }

  test("struct ranking reproduces window ORDER BY v DESC, id semantics") {
    import spark.implicits._
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L),
      ("a", 4L, 20L), ("b", 5L, 1L)).toDF("g", "id", "v")
    val got = rows.groupBy("g")
      .agg(BottomKAgg(struct((-col("v")).as("nv"), col("id").as("id")), 2)
        .as("b"))
      .select(col("g"), posexplode(col("b")))
      .select(col("g"), col("pos"), col("col.id"), (-col("col.nv")).as("v"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    // a: top-2 by v desc, tie on v=30 broken by smaller id first
    assert(got == Set(("a", 0, 2L, 30L), ("a", 1, 3L, 30L), ("b", 0, 5L, 1L)))
  }
}
