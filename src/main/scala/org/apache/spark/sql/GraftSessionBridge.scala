package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Tiny `private[sql]`-access bridge for the graft engine (the same
  * technique every Spark-extension library uses for APIs the project has
  * not yet made public).
  *
  * Why: iterative graph loops need loop-scoped values of session confs
  * (`spark.sql.shuffle.partitions` sized to the frontier, AQE off,
  * auto-broadcast off). Mutating the caller's session conf and restoring
  * it in a `finally` is correct single-threaded but RACES when two
  * queries share one session. `SparkSession.cloneSession()` is the
  * thread-safe primitive: an isolated SessionState (own conf) over the
  * SAME SparkContext and SharedState — cached relations and checkpoint
  * blocks remain visible, and nothing the loop sets can leak into the
  * caller's session. `Dataset.ofRows` re-binds a logical plan to the
  * clone (and back, for results), so loop inputs execute under the loop
  * conf while the caller's session is never touched.
  */
object GraftSessionBridge {

  /** A session sharing context/cache with `s` but owning its conf. */
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()

  /** Re-bind a DataFrame's logical plan to another session (cache
    * lookups go through the shared CacheManager, so persisted fragments
    * still hit).
    */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
