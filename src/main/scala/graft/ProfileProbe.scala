package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Throwaway perf probe (not part of the surface): per-job wall time +
  * per-stage task-time/shuffle metrics for named queries, so optimization
  * work targets the stage that actually burns the time (guide §1.1).
  *
  * Usage: runMain graft.ProfileProbe <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect(): Unit

    final case class StageAgg(var name: String = "", var tasks: Int = 0,
        var taskMs: Long = 0, var gcMs: Long = 0, var shufReadB: Long = 0,
        var shufWriteB: Long = 0, var inputB: Long = 0, var wallMs: Long = 0)
    val stages = mutable.LinkedHashMap[Int, StageAgg]()
    val jobs = mutable.LinkedHashMap[Int, (String, Long, Long)]() // desc, t0, t1
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized { jobs(e.jobId) = (desc, e.time, 0L) }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(j => jobs(e.jobId) = (j._1, j._2, e.time))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.synchronized {
          val a = stages.getOrElseUpdate(si.stageId, StageAgg())
          val site = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileProbe"))
            .getOrElse("").trim
          val rdds = si.rddInfos.map(_.name).distinct.mkString(",").take(40)
          a.name = s"[$rdds] $site"
          a.tasks += si.numTasks
          a.wallMs = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) stages.synchronized {
          val a = stages.getOrElseUpdate(e.stageId, StageAgg())
          a.taskMs += m.executorRunTime
          a.gcMs += m.jvmGCTime
          a.shufReadB += m.shuffleReadMetrics.totalBytesRead
          a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          a.inputB += m.inputMetrics.bytesRead
        }
      }
    }

    def report(tag: String, wall: Double): Unit = {
      println(f"\n===== $tag wall=$wall%.2fs =====")
      val jobRows = jobs.synchronized(jobs.toSeq)
      println(f"jobs=${jobRows.size} sumJobWall=${jobRows.map(j => j._2._3 - j._2._2).sum / 1e3}%.2fs")
      jobRows.sortBy(j => j._2._2 - j._2._3).take(15).foreach { case (id, (_, t0j, t1j)) =>
        println(f"  job $id%4d ${(t1j - t0j) / 1e3}%6.2fs")
      }
      val stageRows = stages.synchronized(stages.values.toSeq)
      stageRows.sortBy(-_.wallMs).take(15).foreach { a =>
        println(f"  stage wall=${a.wallMs / 1e3}%6.2fs tasks=${a.tasks}%4d task=${a.taskMs / 1e3}%7.2fs gc=${a.gcMs / 1e3}%5.2fs in=${a.inputB / 1e6}%8.1fMB sr=${a.shufReadB / 1e6}%8.1fMB sw=${a.shufWriteB / 1e6}%8.1fMB  ${a.name.take(90)}")
      }
    }

    val qs = SparkEntry.queries
    spark.sparkContext.addSparkListener(listener)
    for (name <- args) {
      stages.clear(); jobs.clear()
      spark.sparkContext.setJobDescription(name)
      val tw0 = System.nanoTime()
      qs(name)(spark, sfDir).count(): Unit
      val coldWall = (System.nanoTime() - tw0) / 1e9
      Thread.sleep(500)
      report(s"$name COLD", coldWall)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      report(s"$name WARM", wall)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
