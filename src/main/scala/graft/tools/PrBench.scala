package graft.tools

import graft.core.Sessions
import graft.ingest.{Corpus, Edge, EdgeExtraction}
import graft.graph.{LocalOnly, PageRank, PageRankConfig}
import org.apache.spark.sql.Encoders

/** Dev-only: focused PageRank timing on the corpus-derived edge table. */
object PrBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    implicit val enc: org.apache.spark.sql.Encoder[Edge] = Encoders.product[Edge]
    val spark = Sessions.local(cores, "pr-bench")
    val stamped = Corpus.stamped(Corpus.synthetic(spark, n, repos = 200, maxDegree = 12, seed = 42))
    val t0 = System.nanoTime()
    EdgeExtraction.edges(stamped).write.mode("overwrite").parquet("/tmp/prbench_edges")
    val tBuild = (System.nanoTime() - t0) / 1e9
    val edges = spark.read.parquet("/tmp/prbench_edges").as[Edge]
    val t1 = System.nanoTime()
    val r = PageRank.run(edges, PageRankConfig(tol = 1e-6, maxIter = 200, checkpoint = LocalOnly()))
    val tConv = (System.nanoTime() - t1) / 1e9
    println(f"JOIN cores=$cores corpus=$n edges=${r.edgeCount} verts=${r.vertexCount} " +
      f"build=${tBuild}%.1fs iters=${r.iterations} conv=${tConv}%.1fs " +
      f"per_iter=${tConv / r.iterations}%.2fs eps_iter=${r.edgeCount.toDouble * r.iterations / tConv}%.0f")
    val t2 = System.nanoTime()
    val r2 = graft.graph.CsrPageRank.run(edges, PageRankConfig(tol = 1e-6, maxIter = 200, checkpoint = LocalOnly()))
    val tConv2 = (System.nanoTime() - t2) / 1e9
    println(f"CSR  cores=$cores corpus=$n edges=${r2.edgeCount} verts=${r2.vertexCount} " +
      f"iters=${r2.iterations} conv=${tConv2}%.1fs " +
      f"per_iter=${tConv2 / r2.iterations}%.2fs eps_iter=${r2.edgeCount.toDouble * r2.iterations / tConv2}%.0f")
    spark.stop()
  }
}
