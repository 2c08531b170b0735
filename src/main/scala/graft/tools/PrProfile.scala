package graft.tools

import graft.core.Sessions
import graft.ingest.Edge
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev-only profiling harness for the PageRank iteration loop. */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4, "pr-profile")
    import spark.implicits._
    if (args.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
    val edges = (1 to 5).map(i => (i.toLong, 0L))
    val P = 4
    val e = edges.toDF("src", "dst").repartition(P, col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val vdeg = verts.join(outdeg, Seq("id"), "left").na.fill(0, Seq("outdeg"))
      .repartition(P, col("id")).persist(StorageLevel.MEMORY_AND_DISK)
    val n = vdeg.count()
    var ranks = vdeg.select(col("id"), lit(1.0 / n).as("rank"))
      .repartition(P, col("id")).localCheckpoint(true)
    val t00 = System.nanoTime()
    for (iter <- 1 to 30) {
      val t0 = System.nanoTime()
      val contribs = e.join(vdeg.join(ranks, Seq("id")), e("src") === vdeg("id"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("dst").agg(sum("c").as("contrib"))
      val flowed = contribs.agg(coalesce(sum("contrib"), lit(0.0)).as("flowed"))
      val newRanks = vdeg.join(contribs, vdeg("id") === contribs("dst"), "left")
        .crossJoin(broadcast(flowed))
        .select(col("id"),
          (lit(0.15 / n) + lit(0.85) * (coalesce(col("contrib"), lit(0.0)) +
            (lit(1.0) - col("flowed")) / n)).as("rank"))
        .localCheckpoint(true)
      val delta = newRanks.join(ranks.withColumnRenamed("rank", "old"), Seq("id"))
        .agg(sum(abs(col("rank") - col("old")))).first().getDouble(0)
      ranks = newRanks
      println(f"iter $iter%2d delta=$delta%.2e wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(f"total=${(System.nanoTime() - t00) / 1e9}%.1f s")
    spark.stop()
  }
}
