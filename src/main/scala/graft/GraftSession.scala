package graft

import org.apache.spark.sql.SparkSession

/** Standard session bootstrap for mains and tests.
  *
  * local[N] config tuned per SURVEY.md §4 / the Spark guide: shuffle
  * partitions sized to cores (not the 200 default), AQE on (runtime
  * coalescing + skew-join handling — the knobs that carry these plans to a
  * real cluster), nanosAsLong for the ns-precision events table, UTC for
  * oracle parity.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
