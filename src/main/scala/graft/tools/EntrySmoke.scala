package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Dev-only: the driver's flagship smoke check — entry() must return
  * rows on sf0.001.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "entry-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
