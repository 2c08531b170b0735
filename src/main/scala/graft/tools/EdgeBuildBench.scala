package graft.tools

import graft.core.Sessions
import graft.ingest.{Corpus, EdgeExtraction}

/** Dev-only: times the bench's edge_build phase in isolation (same
  * corpus parameters, warm pass then timed pass, same write+count
  * action as Bench.main).
  */
object EdgeBuildBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(400000L)
    if (!sys.env.contains("SPARK_GRAFT_LOCAL_DIR") && new java.io.File("/dev/shm").isDirectory)
      sys.props("spark.graft.local.dir") = "/dev/shm/graft-spark"
    val spark = Sessions.local(32, "edge-build-bench")
    val warm = Corpus.stamped(Corpus.synthetic(spark, math.max(1L, n / 20), repos = 200, maxDegree = 12, seed = 42))
    EdgeExtraction.edges(warm).write.mode("overwrite").parquet("/tmp/ebb_warm")
    val stamped = Corpus.stamped(Corpus.synthetic(spark, n, repos = 200, maxDegree = 12, seed = 42))
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      EdgeExtraction.edges(stamped).write.mode("overwrite").parquet("/tmp/ebb_out")
      val edges = spark.read.parquet("/tmp/ebb_out").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[ebb] run$i corpus=$n edges=$edges secs=$secs%.2f eps=${edges / secs}%.0f")
    }
    spark.stop()
  }
}
