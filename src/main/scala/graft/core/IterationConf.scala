package graft.core

import org.apache.spark.sql.SparkSession

/** Session-conf guard for iterative loops.
  *
  * Inside a superstep loop the join inputs are already co-partitioned by
  * the iteration key, so the planner's adaptive tricks only hurt:
  *  - auto-broadcast would collect the full vertex state to the driver
  *    EVERY iteration (measured: ~3s/iteration on a 100k-vertex state);
  *  - AQE partition coalescing changes partition counts mid-loop, breaking
  *    the co-partitioning reuse and re-introducing per-iteration shuffles.
  *
  * The guard disables both for the loop body and restores the session
  * conf afterwards. Non-iterative queries (edge derivation, analytics)
  * keep AQE + skew-join splitting.
  */
object IterationConf {
  def withIterationConf[A](spark: SparkSession)(f: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val abjt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abjt)
    }
  }
}
