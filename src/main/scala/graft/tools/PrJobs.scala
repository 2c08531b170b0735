package graft.tools

import graft.core.{IterationConf, Sessions}
import graft.ingest.Edge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only: per-stage timing of one PageRank iteration. */
object PrJobs {
  def main(args: Array[String]): Unit = {
    implicit val enc: org.apache.spark.sql.Encoder[Edge] = Encoders.product[Edge]
    val spark = Sessions.local(32, "pr-jobs")
    import spark.implicits._
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 200) println(f"STAGE ${si.stageId}%4d ${ms}%6d ms tasks=${si.numTasks}%4d  ${si.name.take(90)}")
      }
    })
    IterationConf.withIterationConf(spark) {
      val edges = spark.read.parquet("/tmp/prbench_edges").as[Edge]
      val P = 32
      val e = edges.toDF().repartition(P, col("src")).sortWithinPartitions("src").persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
      val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
      val vdeg = verts.join(outdeg, Seq("id"), "left").na.fill(0, Seq("outdeg"))
        .repartition(P, col("id")).sortWithinPartitions("id").persist(StorageLevel.MEMORY_AND_DISK)
      val n = vdeg.count()
      var ranks = vdeg.select(col("id"), lit(1.0 / n).as("rank"))
        .repartition(P, col("id")).localCheckpoint(true)
      for (iter <- 1 to 20) {
        println(s"---- iter $iter ----")
        val t0 = System.nanoTime()
        val contribs = e.join(vdeg.join(ranks, Seq("id")), e("src") === vdeg("id"))
          .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
          .groupBy("dst").agg(sum("c").as("contrib"))
        val danglingDf = Seq(0.1).toDF("danglingMass")
        val newRanks = vdeg.join(contribs, vdeg("id") === contribs("dst"), "left")
          .crossJoin(broadcast(danglingDf))
          .select(col("id"),
            (lit(0.15 / n) + lit(0.85) * (coalesce(col("contrib"), lit(0.0)) + col("danglingMass") / n)).as("rank"))
          .localCheckpoint(true)
        val t1 = System.nanoTime()
        println(f"  checkpoint job: ${(t1 - t0) / 1e9}%.2f s")
        val row = newRanks.join(ranks.withColumnRenamed("rank", "old"), Seq("id"))
          .join(vdeg.select(col("id"), col("outdeg")), Seq("id"))
          .agg(sum(abs(col("rank") - col("old"))).as("delta"),
            coalesce(sum(when(col("outdeg") === 0, col("rank"))), lit(0.0)).as("dangling")).first()
        println(f"  delta job: ${(System.nanoTime() - t1) / 1e9}%.2f s")
        ranks.queryExecution.analyzed.collectFirst {
          case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
        }.foreach(_.unpersist(false))
        ranks = newRanks
        val gcMs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
          .stream.mapToLong(_.getCollectionTime).sum
        println(s"  rdds=${spark.sparkContext.getPersistentRDDs.size} gcTotalMs=$gcMs")
      }
    }
    spark.stop()
  }
}
