package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.Streams

/** Structured-Streaming behavior: windowed aggregation equals the batch
  * computation on bounded input; sessionization state logic splits at the
  * inactivity gap, and the flatMapGroupsWithState flavour runs end-to-end
  * as a real streaming query.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed streaming counts equal the batch aggregate") {
    val streamed = Streams.runWindowedCounts(spark, sf0001, "spec_win")
      .as[(String, String, Long)].collect().toSet
    val batch = Tables.events(spark, sf0001)
      .groupBy(
        date_format(timestamp_seconds(
          floor(unix_timestamp(col("ts")) / 21600) * 21600),
          "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("events stream reads directory-shaped tables (Spark-written corpus layout)") {
    // The driver's testdata keeps events.parquet as a single FILE; any
    // Spark-written corpus (ScaleUp ladder) makes it a DIRECTORY of part
    // files. The r9 25x ladder caught the glob-only source reading ZERO
    // files from the directory layout — lock both layouts to identical
    // results.
    val dir = java.nio.file.Files.createTempDirectory("graft_evdir_").toString
    try {
      spark.read.parquet(s"$sf0001/events.parquet")
        .repartition(3).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val fromDir = Streams.runWindowedCounts(spark, dir, "spec_win_dir")
        .as[(String, String, Long)].collect().toSet
      val fromFile = Streams.runWindowedCounts(spark, sf0001, "spec_win_file")
        .as[(String, String, Long)].collect().toSet
      assert(fromDir == fromFile && fromDir.nonEmpty)
    } finally {
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("windowed streaming HLL equals the batch native-register aggregate") {
    // the streaming state is the 64-int register buffer itself, so on
    // bounded input the estimate must be BIT-identical to the batch
    // Hll64Agg over the same windows — not approximately equal
    val streamed = Streams.runStreamingHll(spark, sf0001, "spec_shll")
      .as[(String, String, Double)].collect().toSet
    val batch = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .groupBy(
        date_format(timestamp_seconds(
          floor(unix_timestamp(col("ts")) / 21600) * 21600),
          "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"))
      .agg(graft.plans.Hll64Agg(col("user_id")).as("regs"))
      .select(col("win_start"), col("event_type"),
        (lit(graft.operators.Sketches.hllAlpha) * 64 * 64 /
          aggregate(col("regs"), lit(0.0),
            (acc, x) => acc + pow(lit(0.5), x))).as("est_distinct"))
      .as[(String, String, Double)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming dedup equals batch dropDuplicates on bounded input") {
    val streamed = Streams.runStreamingDedup(spark, sf0001, "spec_dedup")
      .as[(Long, String)].collect().toSet
    val batch = Tables.events(spark, sf0001)
      .dropDuplicates("event_id")
      .select(col("event_id"), col("event_type"))
      .as[(Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark bounds state; equals batch on bounded input") {
    val streamed = Streams
      .runStreamingDedupWithinWatermark(spark, sf0001, "spec_dedup_ww")
      .as[(Long, String)].collect().toSet
    val batch = Tables.events(spark, sf0001)
      .dropDuplicates("event_id")
      .select(col("event_id"), col("event_type"))
      .as[(Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-stream interval join equals the batch interval self-join") {
    val streamed = Streams.runIntervalJoin(spark, sf0001, "spec_ssj")
      .as[(Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, sf0001)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("bu"), col("ts").as("buy_ts"))
    val batch = c.join(p,
        col("user_id") === col("bu") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-static enrichment join equals the batch join on bounded input") {
    val streamed = Streams.runStreamStaticJoin(spark, sf0001, "spec_ssj")
      .as[(String, Long, Double)].collect().toSet
    val dim = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val batch = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_purchases"),
        graft.functions.Exact.sumMoney(col("value")).as("revenue"))
      .as[(String, Long, Double)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("foreachBatch upsert sink: partition-scoped overwrite, idempotent replay") {
    val root = java.nio.file.Files.createTempDirectory("upsert").toString
    val out = s"$root/table"
    // pre-seed a partition the stream never touches: dynamic overwrite
    // must leave it alone (a whole-table overwrite would delete it)
    Seq(("zzz-preexisting", 7L, 700L)).toDF("event_type", "n", "cents")
      .write.partitionBy("event_type").parquet(out)
    Streams.runAggUpsertSink(spark, sf0001, out, s"$root/ckpt1")
    val expected = Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(18,4)") * 100).cast("long")).as("cents"))
      .as[(String, Long, Long)].collect().toSet +
      (("zzz-preexisting", 7L, 700L))
    def read() = spark.read.parquet(out)
      .select("event_type", "n", "cents")
      .as[(String, Long, Long)].collect().toSet
    assert(read() == expected)
    // replay from a FRESH checkpoint: same partitions, same values —
    // no double counting, untouched partition still intact
    Streams.runAggUpsertSink(spark, sf0001, out, s"$root/ckpt2")
    assert(read() == expected)
  }

  test("sessionize splits at the inactivity gap") {
    val evs = Seq(
      Streams.Ev(1L, 0L), Streams.Ev(1L, 10L * 60 * 1000000),
      Streams.Ev(1L, 60L * 60 * 1000000), // > 30min gap -> new session
      Streams.Ev(2L, 0L)
    ).toDS()
    val sessions = Streams.sessionize(evs, 30).collect()
    assert(sessions.count(_.user_id == 1L) == 2)
    assert(sessions.count(_.user_id == 2L) == 1)
    val first = sessions.filter(_.user_id == 1L).minBy(_.startMicros)
    assert(first.n == 2)
  }

  test("flatMapGroupsWithState sessionization runs as a streaming query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streams.Ev]
    mem.addData(Streams.Ev(1L, 0L), Streams.Ev(1L, 10L * 60 * 1000000),
      Streams.Ev(1L, 60L * 60 * 1000000))
    val q = Streams.sessionizeStreaming(mem.toDS(), 30)
      .writeStream.format("memory").queryName("spec_sessions")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    q.stop()
    // the closed first session is emitted; the open one stays in state
    val emitted = spark.table("spec_sessions").as[Streams.Session].collect()
    assert(emitted.length == 1 && emitted(0).n == 2)
  }

  test("late audit actually drops stragglers (and keeps the open-window ones)") {
    val out = Streams.runLateAudit(spark, sf0001, "spec_late")
    val total = out.agg(sum(col("cnt"))).head().getLong(0)
    val all = Tables.events(spark, sf0001).count()
    // batch replay of the certified rule: stragglers survive iff their
    // window is still open at the watermark the advancer batch committed
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val wm = ev.filter(col("event_id") % 11 =!= 0)
      .agg(max(col("us"))).head().getLong(0) - 3600000000L
    val expected = ev.filter(col("event_id") % 11 =!= 0 ||
      expr("us div 21600000000") * 21600000000L + 21600000000L > wm).count()
    // if nothing dropped the audit is vacuous (the pre-advancer harness
    // failure mode); and the kept count must equal the rule's prediction
    assert(total < all, s"no straggler was dropped ($total of $all)")
    assert(total == expected, s"drop rule mismatch ($total vs $expected)")
  }

  test("join late audit drops pairs by raw event time (sf0.01: exactly the rule)") {
    // sf0.001 has too few click→purchase pairs to exercise a drop; sf0.01
    // deterministically loses pairs to the straggler filter
    val out = Streams.runIntervalJoinLateAudit(spark, sf001, "spec_jlate")
    val got = out.count()
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val wm = ev.filter(!(col("event_type") === "purchase" &&
        col("event_id") % 13 === 0))
      .agg(max(col("us"))).head().getLong(0) - 3600000000L
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("cus"))
    def pairs(p: org.apache.spark.sql.DataFrame): Long = c.join(p, "user_id")
      .filter(col("pus") >= col("cus") &&
        col("pus") <= col("cus") + 3600000000L).count()
    val full = pairs(ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("pus")))
    val expected = pairs(ev.filter(col("event_type") === "purchase" &&
        (col("event_id") % 13 =!= 0 || col("us") > wm))
      .select(col("user_id"), col("us").as("pus")))
    assert(expected < full, "staging produced no droppable pair")
    assert(got == expected, s"join drop rule mismatch ($got vs $expected)")
  }
}
