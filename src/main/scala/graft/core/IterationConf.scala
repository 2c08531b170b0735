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
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abjt)
      // loops may shrink shuffle.partitions to fit the loop data
      // (sizedPartitions) — always restore the session default
      spark.conf.set("spark.sql.shuffle.partitions", parts)
    }
  }

  /** Partition count sized to the LOOP data, not the session default.
    * With AQE coalescing off inside a superstep loop (see above), a tiny
    * frontier would otherwise pay `spark.sql.shuffle.partitions` empty
    * tasks per stage, per round — pure scheduler fixed cost that at
    * sf0.1 made connected components 34% of the whole query sweep. The
    * loop's work per round is O(rows), so cap partitions at
    * rows/targetRowsPerPartition (floor 1, ceiling the session default:
    * a 10^12-row frontier keeps every partition).
    */
  def sizedPartitions(sessionParts: Int, rows: Long, targetRowsPerPartition: Long = 250000L): Int =
    math.max(1L, math.min(sessionParts.toLong, (rows + targetRowsPerPartition - 1) / targetRowsPerPartition)).toInt
}
