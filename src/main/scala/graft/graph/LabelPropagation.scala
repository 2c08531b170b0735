package graft.graph

import graft.ingest.Edge
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation for community assignment, DataFrame-only.
  *
  * Reference precedent: per-paper topic assignment with fallback
  * propagation (topic/bertopic_title_abstract.py:94-106) and KMeans root
  * grouping (topic/cluster_topic.py:16-25) — the engine's community/label
  * algorithm generalizes both ("top-author topic analysis").
  *
  * Determinism (parallelism-invariance, SURVEY.md §7.6): every tie is
  * broken by the MIN label id — both the per-vertex majority vote
  * (count desc, label asc) and initialization (label = vertex id). The
  * iteration is synchronous (all vertices update from the previous
  * round's labels), so results are identical at any partition count.
  *
  * Scale: one shuffle for the message groupBy((id,label)) and one for the
  * per-vertex argmax; hub skew absorbed by partial aggregation. maxIter
  * caps oscillation (sync LPA can 2-cycle on bipartite structures).
  */
object LabelPropagation {

  final case class LpaResult(labels: DataFrame, iterations: Int, converged: Boolean)

  def run(edges: Dataset[Edge], maxIter: Int = 20): LpaResult =
    graft.core.IterationConf.withIterationConf(edges.sparkSession) {
    val spark = edges.sparkSession
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val bidir = edges.toDF
      .select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v"))
      .union(edges.toDF.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
      .repartition(P, col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val verts = bidir.select(col("u").as("id")).distinct()
      .repartition(P, col("id")).persist(StorageLevel.MEMORY_AND_DISK)
    verts.count()

    var labels = verts.select(col("id"), col("id").as("label")).localCheckpoint(true)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels: edge (u <- label(v))
      val votes = bidir
        .join(labels, bidir("v") === labels("id"))
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("n"))
      // Per-vertex argmax as an aggregation (count desc, label asc): hub
      // vertices get map-side partial combine instead of funneling all
      // their (label, n) rows through one window-sort task. The ordering
      // struct (n, -label) has no ties (labels are distinct per group),
      // so max_by is deterministic.
      val picked = votes
        .groupBy(col("u"))
        .agg(max_by(col("label"), struct(col("n"), negate(col("label")))).as("newLabel"))
        .select(col("u").as("id"), col("newLabel"))

      // Eager localCheckpoint per iteration: truncates lineage and avoids
      // the CacheManager invalidate-rebuild trap of persist/unpersist
      // chains (see PageRank.iterate).
      val newLabels = labels
        .join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("newLabel"), col("label")).as("label"))
        .repartition(P, col("id"))
        .localCheckpoint(true)

      val changed = newLabels
        .join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old"))
        .count()
      labels.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(false))
      labels = newLabels
      iter += 1
      converged = changed == 0
    }
    // labels is a self-contained checkpointed LogicalRDD: release inputs.
    bidir.unpersist(false)
    verts.unpersist(false)
    LpaResult(labels, iter, converged)
  }
}
