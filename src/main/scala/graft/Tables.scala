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
  /** Plain load — NO loader-level fan-out. r15 fanned this scan for all
    * 24 consumers; the r15 driver sweep showed the cheap half (scan→agg
    * and broadcast-bound consumers: q34/q47/q62/q52/q70/q46/q79) paying
    * 1.6–2.9× for an exchange they had no serial stage to trade against —
    * including a RoundRobin shuffle UNDER a BroadcastExchange in q31.
    * `Layout.fanOut` is applied per-site at the proven-heavy consumers
    * only (certSplit/q210/q178 pair scoring, q105/q126/q163/q165), the
    * same per-site discipline the documents table always had. */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings")
}
