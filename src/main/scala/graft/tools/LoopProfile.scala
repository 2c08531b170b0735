package graft.tools

import graft.core.Sessions
import graft.graph.{LocalOnly, PageRank, PageRankConfig, LabelPropagation, ConnectedComponents}
import graft.ingest.Edge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Dev-only: executor-vs-driver split of the loop engines' wall time.
  * Counts jobs and sums job wall (start->end) during each run; the
  * difference to the loop wall is driver-side work (planning, codegen
  * lookup, scheduling gaps).
  */
object LoopProfile {
  def main(args: Array[String]): Unit = {
    implicit val enc: org.apache.spark.sql.Encoder[Edge] = Encoders.product[Edge]
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32, "loop-profile")
    @volatile var jobs = 0
    @volatile var jobWallMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, j.time); jobs += 1
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.remove(j.jobId); if (s != null) jobWallMs += (j.time - s.longValue)
      }
    })
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b")).select("a", "b").distinct()
      .select(col("a").as("src"), col("b").as("dst")).as[Edge]
      .localCheckpoint(true)
    e.count()
    def timed(label: String)(f: => Unit): Unit = {
      Thread.sleep(300) // let listener drain
      val j0 = jobs; val w0 = jobWallMs
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[loopprof] $label%-14s wall=$wall%6.2f s jobs=${jobs - j0}%3d jobWall=${(jobWallMs - w0) / 1000.0}%6.2f s driverGap=${wall - (jobWallMs - w0) / 1000.0}%6.2f s")
    }
    for (i <- 1 to 2) {
      timed(s"pagerank$i") { PageRank.run(e, PageRankConfig(tol = 0.0, maxIter = 20, checkpoint = LocalOnly())).ranks.count(); () }
      timed(s"lpa$i") { LabelPropagation.run(e, maxIter = 10).labels.count(); () }
      timed(s"cc$i") { ConnectedComponents.run(e).components.count(); () }
    }
    spark.stop()
  }
}
