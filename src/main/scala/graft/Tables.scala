package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; here they are
  * single parquet files per table. All reads go through `spark.read.parquet`
  * so predicate pushdown + column pruning apply (SURVEY.md §4.1).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` has shipped in two physical flavours across driver test-data
    * generations: TIMESTAMP(NANOS) — which Spark reads only as a long under
    * spark.sql.legacy.parquet.nanosAsLong=true (set in our session builders)
    * — and timestamp[us] — which Spark reads as TIMESTAMP_NTZ. Normalize both
    * to a microsecond session-TZ TimestampType column here so all downstream
    * operators (`unix_micros`, windows, watermarks) see one type; the session
    * is pinned UTC (GraftSession/Verify) so the NTZ→TZ cast is exact, and
    * DuckDB's TIMESTAMP is also microsecond, so the oracle side matches.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integral `div`, NOT floor(ts/1000): `/` on longs promotes to
        // double, and nanosecond epochs (~1.7e18) exceed double's 53-bit
        // mantissa — the rounded quotient lands 1µs off DuckDB's exact
        // NANOS→US truncation.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // UTC session ⇒ wall-clock == instant; the cast relabels, no shift.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  /** Embeddings fan out to session parallelism at the scan (Layout.fanOut):
    * every consumer is vector math (cosine/L2 passes, PQ codebook scoring)
    * in the stage directly above this narrow scan, and the driver test
    * file is a single one-row-group parquet — ONE task otherwise, however
    * many cores the session has. No-op on sharded corpora (ladder rungs /
    * cluster tables), so nothing is added at scale; measured per-family in
    * OPTIMIZATION_r15.md. */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Layout.fanOut(load(spark, sfDir, "embeddings"))
}
