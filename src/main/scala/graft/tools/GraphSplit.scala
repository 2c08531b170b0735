package graft.tools

import graft.core.Sessions
import graft.graph.{CsrPageRank, LocalOnly, PageRank, PageRankConfig}
import graft.ingest.Edge
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

/** Dev-only: prepare/loop wall split of both PageRank engines over the
  * sweep's part graph (prepareSeconds/loopSeconds from PageRankResult),
  * twice each so the warm split is visible too.
  */
object GraphSplit {
  def main(args: Array[String]): Unit = {
    implicit val enc: org.apache.spark.sql.Encoder[Edge] = Encoders.product[Edge]
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32, "graph-split")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b")).select("a", "b").distinct()
      .select(col("a").as("src"), col("b").as("dst")).as[Edge]
      .localCheckpoint(true)
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val r = PageRank.run(e, PageRankConfig(tol = 0.0, maxIter = 20, checkpoint = LocalOnly()))
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[split] join run$i total=$t%.2f prepare=${r.prepareSeconds}%.2f loop=${r.loopSeconds}%.2f iters=${r.iterations} edges=${r.edgeCount}")
      val t1 = System.nanoTime()
      val r2 = CsrPageRank.run(e, PageRankConfig(tol = 0.0, maxIter = 20, checkpoint = LocalOnly()))
      val t2 = (System.nanoTime() - t1) / 1e9
      println(f"[split] csr  run$i total=$t2%.2f prepare=${r2.prepareSeconds}%.2f loop=${r2.loopSeconds}%.2f iters=${r2.iterations}")
    }
    spark.stop()
  }
}
