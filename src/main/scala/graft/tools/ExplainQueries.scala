package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Dev-only: dump formatted physical plans for named SparkEntry queries
  * (plan audit: broadcast where expected, PushedFilters/ReadSchema sane,
  * WholeStageCodegen spans wide).
  *
  * Usage: runMain graft.tools.ExplainQueries <sfDir> <name...>
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "explain-queries")
    SparkEntry.queries.filter(q => names.isEmpty || names(q._1)).foreach { case (name, fn) =>
      println(s"\n===================== $name =====================")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"(failed to plan: ${e.getMessage})") }
    }
    spark.stop()
  }
}
