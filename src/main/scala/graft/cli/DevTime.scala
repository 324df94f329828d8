package graft.cli

/** Dev utility: time individual registered queries at a given SF dir.
  * Usage: runMain graft.cli.DevTime <sfDir> <queryName>... (repeats each
  * query twice so the second number is free of first-touch JIT cost).
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    for (n <- names; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"DEVTIME $n pass$pass $sec%.2fs rows=$rows")
    }
    spark.stop()
  }
}
