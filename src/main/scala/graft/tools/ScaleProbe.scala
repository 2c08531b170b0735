package graft.tools

import graft.core.Sessions
import graft.ingest.{Corpus, Edge, EdgeExtraction}
import graft.graph.{LocalOnly, PageRank, PageRankConfig}
import org.apache.spark.sql.Encoders

/** Dev-only probe for the north-rule scaling gate: runs fixed-iteration
  * PageRank on a synthetic edge table of a given size at several
  * parallelism levels and prints throughput + N->4N efficiency.
  *
  * Usage: runMain graft.tools.ScaleProbe <corpusRows> <iters> <cores...>
  */
object ScaleProbe {
  private implicit val edgeEnc: org.apache.spark.sql.Encoder[Edge] = Encoders.product[Edge]

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4000000L
    val iters = if (args.length > 1) args(1).toInt else 8
    val cores = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(8, 32)
    val path = s"/tmp/graft_scale_edges_$n"

    // Build (or reuse) the edge table once.
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      val s = Sessions.local(32, "scale-probe-build")
      val stamped = Corpus.stamped(Corpus.synthetic(s, n, repos = 200, maxDegree = 12, seed = 42))
      val t0 = System.nanoTime()
      EdgeExtraction.edges(stamped).write.mode("overwrite").parquet(path)
      println(f"edge build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      s.stop()
    }

    val useCsr = sys.env.get("SPARK_GRAFT_PROBE_CSR").contains("1")
    def pr(edges: org.apache.spark.sql.Dataset[Edge], it: Int) =
      if (useCsr) graft.graph.CsrPageRank.run(edges, PageRankConfig(tol = 0.0, maxIter = it, checkpoint = LocalOnly()))
      else PageRank.run(edges, PageRankConfig(tol = 0.0, maxIter = it, checkpoint = LocalOnly()))
    val results = cores.map { c =>
      val s = Sessions.local(c, s"scale-probe-$c")
      val edges = s.read.parquet(path).as[Edge]
      // warm: materialize the parquet footer reads + JIT outside the timer
      edges.count()
      pr(edges, 2)
      val t0 = System.nanoTime()
      val r = pr(edges, iters)
      val secs = (System.nanoTime() - t0) / 1e9
      val eps = r.edgeCount.toDouble * iters / r.loopSeconds
      println(f"cores=$c%2d edges=${r.edgeCount} iters=$iters wall=$secs%.2f s prepare=${r.prepareSeconds}%.2f loop=${r.loopSeconds}%.2f (${r.loopSeconds / iters}%.3f/iter)  loop ${eps / 1e6}%.2f M edges/s/iter")
      s.stop()
      (c, secs, r.loopSeconds, r.prepareSeconds)
    }
    for (Seq((c1, t1, l1, p1), (c2, t2, l2, p2)) <- results.sliding(2)) {
      val eff = (t1 / t2) / (c2.toDouble / c1)
      val effLoop = (l1 / l2) / (c2.toDouble / c1)
      val effPrep = (p1 / p2) / (c2.toDouble / c1)
      println(f"efficiency $c1->$c2: full=$eff%.3f loop=$effLoop%.3f prepare=$effPrep%.3f  (t$c1=$t1%.2f t$c2=$t2%.2f)")
    }
  }
}
