package graft.cli

import graft.{GraftSession, SparkEntry}

/** Runs named registry queries against a data dir and prints row count,
  * wall seconds, and (for small results) the rows themselves — the ladder
  * adjudication tool: lets the candidate-mass audits (q230-q233) and other
  * 1-row certifiers report their measured values at scale factors the
  * Verify/DuckDB gate can't reach (DuckDB replays at 25x/100x take longer
  * than the Spark run being audited).
  *
  * Usage: QueryShow <dataDir> <queryName> [queryName...]
  */
object QueryShow {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[queryshow] $name rows=$n wall=$sec%.2f s")
      if (n <= 20) df.show(20, truncate = false)
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.gc()
    }
    spark.stop()
  }
}
