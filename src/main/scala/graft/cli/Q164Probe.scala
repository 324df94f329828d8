package graft.cli

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.GraftSession
import graft.streaming.Streams

/** Scratch instrumentation probe for q164_stream_sessions' ladder-rung
  * variance (r12 watch item): runs the production sessionizer streaming
  * query against a data dir and dumps every micro-batch's progress JSON
  * (durationMs breakdown, state-operator commit times, rows/s), which the
  * memory-sink harness path never surfaces. Dev tool, like [[DebugProbe]].
  */
object Q164Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("Q164_PARTS", "4"))
    val t0 = System.nanoTime()
    val evs = Streams.readEventsStream(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[Streams.Ev]
    val q = Streams.sessionizeStreaming(evs, 30).toDF()
      .writeStream.format("memory").queryName("q164probe")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(f"[q164probe] wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"rows=${spark.table("q164probe").count()}")
    q.recentProgress.foreach(p => println(p.json))
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.stop()
  }
}
