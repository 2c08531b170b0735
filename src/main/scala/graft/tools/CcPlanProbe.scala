package graft.tools

import graft.core.{IterationConf, Sessions}
import org.apache.spark.sql.functions._

/** Dev-only: dump the physical plan of one CC round (large-star +
  * small-star) to audit exchange count and reuse.
  */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "cc-plan")
    import spark.implicits._
    val e0 = (0L until 200000L).map(i => (i % 5000, (i * 7 + 1) % 5000)).distinct
      .toDF("u", "v").filter(col("u") =!= col("v"))
    IterationConf.withLoopSession(spark, 8) { loop =>
      val e = IterationConf.rebind(e0, loop).repartition(8, col("u")).localCheckpoint(true)
      val P = 8
      val bidirL = e.union(e.select(col("v").as("u"), col("u").as("v")))
      // inline copies of the private large/small star bodies
      def largeStar(bidir: org.apache.spark.sql.DataFrame) = {
        val b = bidir.repartition(P, col("u"))
        val m = b.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
        b.join(m, "u").filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v")).distinct()
      }
      def smallStar(bidir: org.apache.spark.sql.DataFrame) = {
        val le = bidir.filter(col("v") < col("u")).repartition(P, col("u"))
        val m = le.groupBy(col("u")).agg(min(col("v")).as("m"))
        val reattached = le.join(m, "u").select(col("v").as("u"), col("m").as("v"))
        val selfEdge = m.select(col("u"), col("m").as("v"))
        reattached.union(selfEdge).filter(col("u") =!= col("v"))
          .repartition(P, col("u")).dropDuplicates()
      }
      val afterLarge = largeStar(bidirL)
      val bidirS = afterLarge.union(afterLarge.select(col("v").as("u"), col("u").as("v")))
      val next = smallStar(bidirS)
      println("===== one CC round =====")
      next.explain("formatted")
    }
    spark.stop()
  }
}
