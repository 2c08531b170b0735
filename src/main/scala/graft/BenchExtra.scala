package graft

import graft.core.Sessions

/** Dev-side sweep replica (guide §1): times the SAME queries with the
  * SAME action (`df.count()`), session config and shuffle dir as the
  * frozen Bench sweep, without the legs/north/edge-build phases — so an
  * optimization can be measured in minutes instead of a 27-minute full
  * bench. Optionally repeats each query and reports every sample; the
  * FIRST sample corresponds to what the driver's single-pass sweep sees.
  *
  * This is measurement-only tooling: Bench.scala itself is untouched.
  *
  * Usage: runMain graft.BenchExtra [repeats] [nameSubstring...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(1)
    val nameFilters = (if (args.headOption.exists(a => scala.util.Try(a.toInt).isSuccess)) args.drop(1) else args).toSeq
    if (!sys.env.contains("SPARK_GRAFT_LOCAL_DIR") && new java.io.File("/dev/shm").isDirectory)
      sys.props("spark.graft.local.dir") = "/dev/shm/graft-spark"
    val spark = Sessions.local(cpus, "graft-bench-extra")
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilters.isEmpty || nameFilters.exists(n.contains) }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    for ((name, fn) <- sorted) {
      spark.sparkContext.setJobDescription(name)
      val samples = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      out(name) = samples
      println(f"[sweep] $name%-24s ${samples.map(s => f"$s%.3f").mkString(" ")}")
    }
    val firstTotal = out.values.map(_.head).sum
    val qs = out.map { case (k, v) => s""""$k":${"%.3f".format(v.head)}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"sweep_first_total_sec","value":${"%.2f".format(firstTotal)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
