package graft.tools
import graft.SparkEntry
import graft.core.Sessions
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sf = args(0); val names = args.drop(1)
    val spark = Sessions.local(32, "time-q")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sf).count()
      println(f"[timeq] $n rows=$c ${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      val c2 = SparkEntry.queries(n)(spark, sf).count()
      println(f"[timeq] $n(warm) rows=$c2 ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
