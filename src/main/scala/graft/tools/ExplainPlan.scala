package graft.tools

import graft.core.{IterationConf, Sessions}
import graft.ingest.Edge
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only: dump the physical plan of one PageRank iteration to count
  * exchanges (goal: ONE shuffle per iteration past the cached inputs).
  */
object ExplainPlan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "explain")
    import spark.implicits._
    IterationConf.withIterationConf(spark) {
      val edges = (0L until 10000L).map(i => (i % 500, (i * 7) % 500)).distinct
        .toDF("src", "dst").as[Edge]
      val P = 8
      val e = edges.toDF().repartition(P, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
      val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
      val vdeg = verts.join(outdeg, Seq("id"), "left").na.fill(0, Seq("outdeg"))
        .repartition(P, col("id")).persist(StorageLevel.MEMORY_AND_DISK)
      val n = vdeg.count()
      val ranks = vdeg.select(col("id"), lit(1.0 / n).as("rank"))
        .repartition(P, col("id")).localCheckpoint(true)

      val contribs = e.join(vdeg.join(ranks, Seq("id")), e("src") === vdeg("id"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      val newRanks = vdeg.join(contribs, vdeg("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(0.15 / n) + lit(0.85) * (coalesce(col("contrib"), lit(0.0)) + lit(0.1) / n)).as("rank"))
      println("===== newRanks plan =====")
      newRanks.explain("formatted")
      val deltaPlan = newRanks
        .join(ranks.withColumnRenamed("rank", "old"), Seq("id"))
        .join(vdeg.select(col("id"), col("outdeg")), Seq("id"))
        .agg(sum(abs(col("rank") - col("old"))).as("delta"),
          coalesce(sum(when(col("outdeg") === 0, col("rank"))), lit(0.0)).as("dangling"))
      println("===== delta plan =====")
      deltaPlan.explain("formatted")
    }
    spark.stop()
  }
}
