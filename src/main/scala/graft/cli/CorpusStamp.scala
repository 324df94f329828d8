package graft.cli

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Content-checksum stamp for a test-data directory — the corpus-pinning
  * tool the r12 verdict asked for (directive #1): ladder rungs built by
  * [[ScaleUp]] into /tmp are wiped between sessions, so cross-round timing
  * comparisons need a committed proof that two rungs held the SAME bytes.
  *
  * Per table it emits one JSON line with the q176 machinery generalized to
  * every column: row hash = the shared 60-bit md5 bucket hash over ALL
  * columns in schema order (cast to string, NULL marked out-of-band so a
  * NULL column is distinct from an empty one), folded order-independently
  * into two exact int64 sum channels (h mod 2^31 / h >> 31 — exact to
  * ~4e9 rows), an xor channel against compensating-sum collisions, and
  * min/max. Identical stamp lines ⇒ identical logical table content,
  * regardless of file count, row order, or physical parquet flavour —
  * which is exactly the variable the q164 watch item could not replay.
  *
  * Usage: CorpusStamp <dataDir> [table ...]   (default: all ten tables)
  */
object CorpusStamp {
  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tables = if (args.length > 1) args.drop(1).toSeq else AllTables
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val parts = df.schema.fields.map(f =>
        coalesce(col(f.name).cast("string"), lit("\u0002null")))
      val h = graft.functions.XHash.bucketHash("stamp", parts.toSeq: _*)
      val row = df.select(h.as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h") % lit(2147483648L)).cast("long").as("lo"),
          sum(shiftright(col("h"), 31)).cast("long").as("hi"),
          expr("bit_xor(h)").as("x"),
          min(col("h")).as("mn"), max(col("h")).as("mx"))
        .collect()(0)
      println(s"""{"table":"$t","n_rows":${row.getLong(0)},""" +
        s""""checksum_lo":${row.getLong(1)},"checksum_hi":${row.getLong(2)},""" +
        s""""checksum_xor":${row.getLong(3)},"min_h":${row.getLong(4)},""" +
        s""""max_h":${row.getLong(5)}}""")
    }
    spark.stop()
  }
}
