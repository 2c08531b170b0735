package graft.tools

import graft.core.Sessions
import graft.ingest.{Corpus, EdgeExtraction}

/** Dev-only: materialize the bench's north/scaling probe edge table at
  * its standard path (same corpus parameters as Bench.main), so loop
  * experiments can use graft.BenchLeg without running the full bench.
  */
object ProbeEdges {
  def main(args: Array[String]): Unit = {
    val probeN = args.headOption.map(_.toLong).getOrElse(10000000L)
    val path = s"/tmp/graft_probe_edges_$probeN"
    if (new java.io.File(path + "/_SUCCESS").exists()) { println(s"exists: $path"); return }
    val spark = Sessions.local(32, "graft-probe-build")
    val st = Corpus.stamped(Corpus.synthetic(spark, probeN, repos = 200, maxDegree = 12, seed = 42))
    EdgeExtraction.edges(st).write.mode("overwrite").parquet(path)
    println(s"built: $path rows=" + spark.read.parquet(path).count())
    spark.stop()
  }
}
