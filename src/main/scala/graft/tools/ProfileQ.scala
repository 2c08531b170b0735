package graft.tools

import graft.SparkEntry
import graft.core.Sessions
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev-only: run named SparkEntry queries with a listener that prints
  * per-job and per-stage wall time, task counts and shuffle bytes — the
  * local-mode stand-in for the Spark UI's stage table (guide §1.1/§7.1).
  *
  * Usage: runMain graft.tools.ProfileQ <sfDir> <name...>
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    if (!sys.env.contains("SPARK_GRAFT_LOCAL_DIR") && new java.io.File("/dev/shm").isDirectory)
      sys.props("spark.graft.local.dir") = "/dev/shm/graft-spark"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "profile-q")

    final case class StageRec(id: Int, name: String, tasks: Int, var ms: Long = -1,
        var shufRead: Long = 0, var shufWrite: Long = 0, var input: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, StageRec]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, mutable.Buffer[Int])]
    val jobEnd = mutable.LinkedHashMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(j.jobId) = (j.time, j.stageIds.toBuffer) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobEnd(j.jobId) = j.time }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.synchronized {
        val info = s.stageInfo
        val rec = StageRec(info.stageId, info.name.takeWhile(_ != '\n'), info.numTasks)
        rec.ms = (for { a <- info.completionTime; b <- info.submissionTime } yield a - b).getOrElse(-1L)
        rec.shufRead = info.taskMetrics.shuffleReadMetrics.totalBytesRead
        rec.shufWrite = info.taskMetrics.shuffleWriteMetrics.bytesWritten
        rec.input = info.taskMetrics.inputMetrics.bytesRead
        stages(info.stageId) = rec
      }
    })

    names.foreach { n =>
      stages.synchronized(stages.clear()); jobs.synchronized { jobs.clear(); jobEnd.clear() }
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"\n===== $n rows=$c total=$secs%.2f s =====")
      jobs.synchronized {
        jobs.foreach { case (jid, (t0j, sids)) =>
          val dur = jobEnd.get(jid).map(e => (e - t0j) / 1000.0).getOrElse(-1.0)
          println(f"job $jid%3d  ${dur}%6.2f s  stages=${sids.mkString(",")}")
        }
      }
      stages.synchronized {
        stages.toSeq.sortBy(_._1).foreach { case (_, r) =>
          println(f"  stage ${r.id}%4d ${r.ms / 1000.0}%7.2f s tasks=${r.tasks}%4d " +
            f"in=${r.input / 1e6}%8.1f MB sr=${r.shufRead / 1e6}%8.1f MB sw=${r.shufWrite / 1e6}%8.1f MB  ${r.name.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
