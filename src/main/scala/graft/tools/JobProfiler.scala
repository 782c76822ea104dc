package graft.tools

import graft.{BenchAction, GraftSession, SparkEntry, Tables}
import org.apache.spark.scheduler._

import scala.collection.mutable

/** Per-query job/stage breakdown for optimization work (guide §1: measure
  * first). Runs each named query twice (cold, then warm-codegen) with a
  * SparkListener and prints one line per Spark job — wall, stage count,
  * task count, shuffle read/write bytes — plus a query total. Usage:
  *   tools/run.sh graft.tools.JobProfiler /root/testdata/sf0.1 q1,... [reps]
  */
object JobProfiler {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(Some(s"local[$cpus]"), cpus.toInt, "graft-jobprofile")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach(t =>
      try Tables.load(spark, dir, t).count() catch { case _: Throwable => () })

    final case class JobRec(id: Int, var desc: String = "", var t0: Long = 0L,
      var t1: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
      var shufR: Long = 0L, var shufW: Long = 0L, var inB: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRec(js.jobId)
        r.t0 = js.time
        r.desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        r.stages = js.stageIds.size
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
        jobs(js.jobId) = r
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.t1 = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = jobs.synchronized {
        for (jid <- stageToJob.get(sc.stageInfo.stageId); r <- jobs.get(jid)) {
          r.tasks += sc.stageInfo.numTasks
          val m = sc.stageInfo.taskMetrics
          if (m != null) {
            r.shufR += m.shuffleReadMetrics.totalBytesRead
            r.shufW += m.shuffleWriteMetrics.bytesWritten
            r.inB += m.inputMetrics.bytesRead
          }
          if (sys.env.contains("GRAFT_PROFILE_STAGES") && sc.stageInfo.numTasks >= 8) {
            val i = sc.stageInfo
            val ms = for (s <- i.submissionTime; e <- i.completionTime) yield e - s
            println(f"      stage ${i.stageId}%4d tasks=${i.numTasks}%3d ${ms.getOrElse(-1L)}%5d ms  ${i.name.take(110)}")
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (rep <- 1 to reps) {
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        val t0 = System.nanoTime()
        BenchAction.run(fn(spark, dir))
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        // let listener events drain
        Thread.sleep(300)
        val snap = jobs.synchronized { jobs.values.toVector }
        println(f"== $name rep$rep total=$secs%.3f s jobs=${snap.size}")
        if (rep == reps) {
          var acc = 0.0
          snap.foreach { r =>
            val w = (r.t1 - r.t0) / 1e3
            acc += w
            println(f"   job ${r.id}%4d ${w}%7.3f s stages=${r.stages}%2d tasks=${r.tasks}%4d " +
              f"in=${r.inB / 1024}%7dK sr=${r.shufR / 1024}%6dK sw=${r.shufW / 1024}%6dK")
          }
          println(f"   [sum-of-jobs ${acc}%.3f s; gaps=${secs - acc}%.3f s]")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
