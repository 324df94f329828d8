package graft.cli

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Writes each named query's `.explain("formatted")` physical plan to
  * `<outDir>/<name>_<suffix>.txt` — the optimization-round evidence trail
  * (plan shape before/after each change: Exchange count, join strategy,
  * PushedFilters/ReadSchema). Most queries only plan (nothing executes),
  * but iterative operators that materialize mid-build (localCheckpoint,
  * eager persist) do run their rounds — dump on an idle box when timing
  * matters elsewhere.
  *
  * Usage: PlanDump <dataDir> <outDir> <suffix> [queryName...]
  *        (no names = every registered query)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val txt =
        try {
          val df = fn(spark, dir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch {
          case e: Throwable => s"PLAN FAILED: ${e.getMessage}"
        }
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      // a handful of operators persist/materialize at plan-build time;
      // keep the session clean between dumps like QueryShow does
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    println(s"[plandump] wrote ${names.size} plans to $outDir (suffix=$suffix)")
    spark.stop()
  }
}
