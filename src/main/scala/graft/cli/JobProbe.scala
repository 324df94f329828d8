package graft.cli

import scala.collection.mutable

import org.apache.spark.scheduler._

import graft.{GraftSession, SparkEntry}

/** Runs named registry queries once each and prints a per-job breakdown
  * (job wall, stage count, task count, task-time sum) from a listener —
  * the local answer to "where does this query's wall clock actually go":
  * job-count overhead vs one dominant stage vs scheduling gaps. The gap
  * between summed job walls and the query wall is driver-side work
  * (planning, broadcast builds, checkpoint bookkeeping).
  *
  * Usage: JobProbe <dataDir> <queryName> [queryName...]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    case class Job(id: Int, start: Long, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, e.time)
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.tasks += e.stageInfo.numTasks
          }
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            if (e.taskInfo != null)
              j.taskMs += e.taskInfo.duration
          }
        }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // warm-up pass so JIT/codegen does not masquerade as job time
      try { fn(spark, dir).count() } catch { case _: Throwable => () }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.gc()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      // record — never swallow — a measured-pass failure: a crashed run's
      // wall/jobs breakdown must be visibly invalid (r15 ADVICE)
      val failure: Option[Throwable] =
        try { fn(spark, dir).count(); None } catch { case e: Throwable => Some(e) }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain (no public waitUntilEmpty)
      spark.sparkContext.removeSparkListener(listener)
      val snap = jobs.synchronized { jobs.values.toSeq }
      val failTag = failure.map(e =>
        s" FAILED(${e.getClass.getSimpleName}: ${e.getMessage})").getOrElse("")
      println(f"[jobprobe] $name wall=$wall%.2f s jobs=${snap.size}$failTag")
      failure.foreach(_ => println(
        s"[jobprobe]   !! measured pass threw - numbers cover a crashed execution"))
      var covered = 0L
      snap.foreach { j =>
        val ms = math.max(0L, j.end - j.start)
        covered += ms
        println(f"[jobprobe]   job=${j.id}%-4d wall=${ms / 1000.0}%6.2f s " +
          f"stages=${j.stages}%-3d tasks=${j.tasks}%-5d " +
          f"taskSum=${j.taskMs / 1000.0}%7.2f s")
      }
      println(f"[jobprobe]   job-wall sum=${covered / 1000.0}%.2f s " +
        f"(driver/planning gap=${wall - covered / 1000.0}%.2f s)")
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      System.gc()
    }
    spark.stop()
  }
}
