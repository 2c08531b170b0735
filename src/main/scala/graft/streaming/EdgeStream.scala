package graft.streaming

import graft.ingest.{Edge, EdgeExtraction}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming ingest: the batch edge-derivation semantics
  * (ingest.EdgeExtraction) over an UNBOUNDED corpus stream — the shape a
  * continuously-crawled corpus lands in (`readStream` over a landing
  * directory → these transforms → `writeStream`).
  *
  * Design:
  *  - the per-language reference explode is stateless, so the exact
  *    batch projection/generator is reused verbatim;
  *  - resolution is a STREAM-STATIC join against a broadcast module
  *    dimension snapshot (unbounded-state stream-stream joins are never
  *    needed: module definitions change slowly and a snapshot refresh is
  *    a restart with the same checkpoint);
  *  - event-time analytics use watermarked windowed aggregation (late
  *    rows beyond the watermark are dropped deterministically);
  *  - running per-source totals keep custom state via
  *    mapGroupsWithState — O(#distinct sources) state, each group a
  *    single long.
  *
  * Every operator here is checkpointable through the engine's normal
  * `writeStream.option("checkpointLocation", ...)` path; resume
  * semantics come from Spark's offset/state store, complementing the
  * batch engine's Supersteps commits.
  */
object EdgeStream {

  /** Unresolved (src, ref_module) reference stream — stateless. */
  def references(corpusStream: DataFrame): DataFrame =
    EdgeExtraction.references(corpusStream)

  /** Resolved edge stream via the broadcast module-dimension snapshot.
    * Append-mode safe: no streaming state at all.
    */
  def edges(corpusStream: DataFrame, moduleDim: DataFrame): DataFrame =
    references(corpusStream)
      .join(broadcast(moduleDim), col("ref_module") === col("module"))
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))

  /** Edge arrivals per (event-time window, dst): watermarked windowed
    * aggregation — the streaming twin of the in-degree histogram. Rows
    * later than `lateness` past the watermark are dropped.
    */
  def windowedInDegree(
      edgesWithTime: DataFrame,
      windowLength: String = "10 minutes",
      lateness: String = "5 minutes"
  ): DataFrame =
    edgesWithTime
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("dst"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup — the streaming face of the batch dedup
    * family (textops.Dedup.exact): drop repeats of `keyCols` arriving
    * within the watermark horizon. dropDuplicatesWithinWatermark keeps
    * state only for `lateness` of event time (bounded state — the 100 TB
    * answer; an unbounded dropDuplicates would grow state forever), so a
    * duplicate arriving later than the horizon is deliberately re-kept:
    * the contract is "exactly-once within the lateness window", and the
    * batch exact-dedup pass downstream remains the global guarantee.
    */
  def dedupWithinWatermark(
      withTime: DataFrame,
      keyCols: Seq[String],
      lateness: String = "10 minutes"
  ): DataFrame =
    withTime
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Cumulative out-degree per source across batches — explicit keyed
    * state via mapGroupsWithState (update output mode). State is one long
    * per distinct source.
    *
    * TTL is an explicit OPT-IN (ADVICE r5 — a defaulted TTL silently
    * turned all-time totals into per-activity-epoch totals for existing
    * callers, and re-emitted a duplicate (src, total) row on timeout):
    *  - `ttl = None` (the default): classic all-time cumulative counts,
    *    `NoTimeout`, state never dropped — bounded only by the distinct
    *    key count;
    *  - `ttl = Some(d)`: the key set is unbounded on a crawled corpus, so
    *    each group carries a processing-time TTL — a source idle for `d`
    *    has its state dropped (the timed-out invocation re-emits the
    *    final total, then removes), and a source that reappears later
    *    counts from zero. The contract becomes "cumulative within an
    *    activity epoch"; the batch degree aggregation remains the
    *    all-time answer.
    *
    * Deployment note (TTL mode): processing-time timers make the engine
    * schedule a micro-batch EVERY trigger even with no new data (timers
    * are wall-clock driven), so run that sink with an explicit
    * `Trigger.ProcessingTime(...)` interval — under the default
    * zero-interval trigger the query busy-loops empty batches, and
    * `processAllAvailable()` never observes a quiescent stream.
    */
  def cumulativeOutDegree(edges: Dataset[Edge], ttl: Option[String] = None): Dataset[(Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val timeoutConf = if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    edges
      .groupByKey(_.src)
      .mapGroupsWithState[Long, (Long, Long)](timeoutConf) {
        (src: Long, rows: Iterator[Edge], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.getOption.getOrElse(0L)
            state.remove()
            (src, last)
          } else {
            val total = state.getOption.getOrElse(0L) + rows.size
            state.update(total)
            ttl.foreach(state.setTimeoutDuration)
            (src, total)
          }
      }
  }
}
