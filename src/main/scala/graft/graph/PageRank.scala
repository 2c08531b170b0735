package graft.graph

import graft.ingest.Edge
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Where iteration state is checkpointed. */
sealed trait CheckpointPolicy
/** State kept as eager localCheckpoint blocks (lineage truncated every
  * iteration). Fast, NOT resumable — bench mode.
  */
final case class LocalOnly(every: Int = 1) extends CheckpointPolicy
/** Durable resumable checkpoints: every `every` iterations a committed
  * superstep (parquet + metrics + per-partition lineage + atomic marker)
  * lands in `runDir` — the production mode.
  */
final case class Durable(runDir: String, every: Int = 1) extends CheckpointPolicy

final case class PageRankConfig(
    alpha: Double = 0.85,
    tol: Double = 1e-6,
    maxIter: Int = 200,
    checkpoint: CheckpointPolicy = LocalOnly()
)

final case class PageRankResult(
    ranks: DataFrame, // (id: long, rank: double), sum(rank) == 1
    iterations: Int,
    converged: Boolean,
    deltas: Seq[Double],
    edgeCount: Long,
    vertexCount: Long
)

/** PageRank with teleport (1-alpha) and dangling-mass redistribution,
  * expressed purely as DataFrame joins + aggregations (no RDD/GraphX).
  *
  * Reference precedent: the per-vertex importance score in [0,1]
  * (isKeyPaper node probability, create_field/compute_key_papers.py:210-259)
  * and citation-count ranking, generalized over the derived citation edge
  * table (create_field/graph.py:28-43).
  *
  * Shuffle discipline (one shuffle per iteration at steady state):
  *  - `edges` is hash-partitioned by `src` once and cached;
  *  - rank state is hash-partitioned by `id`; the contribution join
  *    (edges.src == ranks.id) is then co-partitioned → no exchange;
  *  - the message aggregation `groupBy(dst)` is the single per-iteration
  *    shuffle; its output partitioning hash(dst) matches the vertex
  *    state's hash(id), so the finalize join needs no exchange either;
  *  - dangling mass is recovered by conservation (dangling = 1 − Σ
  *    contribs) as a 1-row aggregate broadcast back in — no extra pass;
  *  - skew: hub dst vertices make groupBy(dst) skewed; HashAggregate's
  *    partial (map-side) combine is exactly the two-phase salted
  *    aggregation plan, done natively by Spark.
  */
object PageRank {

  /** Cached, co-partitioned graph inputs shared across iterations. */
  private final case class Prepared(e: DataFrame, vdeg: DataFrame, n: Long, m: Long, parts: Int)

  private def prepare(edges: Dataset[Edge]): Prepared = {
    val spark = edges.sparkSession
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.toDF
      .select(col("src"), col("dst"))
      .repartition(P, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = e.count()
    val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val vdeg = verts
      .join(outdeg, Seq("id"), "left")
      .na.fill(0, Seq("outdeg"))
      .repartition(P, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = vdeg.count()
    Prepared(e, vdeg, n, m, P)
  }

  def run(edges: Dataset[Edge], cfg: PageRankConfig = PageRankConfig()): PageRankResult = {
    val g = prepare(edges)
    if (g.n == 0)
      return PageRankResult(edges.sparkSession.emptyDataFrame, 0, converged = true, Nil, 0L, 0L)
    val ranks0 = g.vdeg.select(col("id"), lit(1.0 / g.n).as("rank"))
    iterate(g, ranks0, 0, cfg)
  }

  /** Resume from the last committed superstep in runDir (or start fresh
    * if none). Final state is identical to an uninterrupted run because
    * each superstep snapshot is the complete iteration state.
    */
  def resume(edges: Dataset[Edge], runDir: String, cfg: PageRankConfig): PageRankResult = {
    val spark = edges.sparkSession
    val durableCfg = cfg.checkpoint match {
      case d: Durable => cfg
      case _          => cfg.copy(checkpoint = Durable(runDir, 1))
    }
    Supersteps.lastCommitted(spark, runDir) match {
      case None => run(edges, durableCfg)
      case Some(step) =>
        val state = Supersteps.readState(spark, runDir, step)
        // Already-converged runs return the committed state as-is.
        val metrics = Supersteps.readMetrics(spark, runDir, step)
        if (metrics.contains("\"converged\":1.0")) {
          val delta = "\"l1_delta\":([0-9.eE+-]+)".r
            .findFirstMatchIn(metrics).map(_.group(1).toDouble).getOrElse(0.0)
          PageRankResult(state, step, converged = true, Seq(delta), -1L, state.count())
        } else {
          val g = prepare(edges)
          iterate(g, state, step, durableCfg)
        }
    }
  }

  private def iterate(
      g: Prepared,
      ranks0: DataFrame,
      startIter: Int,
      cfg: PageRankConfig
  ): PageRankResult = {
    val spark = g.e.sparkSession
    // Eager localCheckpoint truncates lineage EVERY iteration: the new
    // state becomes a materialized LogicalRDD with no plan dependency on
    // the previous iteration. (Chained persist/unpersist instead causes
    // Spark's CacheManager to invalidate+rebuild dependent cache entries
    // on every unpersist — measured exponential recompute.)
    var ranks = ranks0.repartition(g.parts, col("id")).localCheckpoint(true)

    var iter = startIter
    var converged = false
    var deltas = Vector.empty[Double]

    while (iter < cfg.maxIter && !converged) {
      val contribs = g.e
        .join(g.vdeg.join(ranks, Seq("id")), g.e("src") === g.vdeg("id"))
        .select(col("dst"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("dst")
        .agg(sum("c").as("contrib"))

      // Dangling mass by conservation: what didn't flow along edges.
      val flowed = contribs.agg(coalesce(sum("contrib"), lit(0.0)).as("flowed"))

      val newRanks = g.vdeg
        .join(contribs, g.vdeg("id") === contribs("dst"), "left")
        .crossJoin(broadcast(flowed))
        .select(
          col("id"),
          (lit((1.0 - cfg.alpha) / g.n) +
            lit(cfg.alpha) * (coalesce(col("contrib"), lit(0.0)) +
              (lit(1.0) - col("flowed")) / g.n)).as("rank")
        )
        .localCheckpoint(true)

      val delta = newRanks
        .join(ranks.withColumnRenamed("rank", "old"), Seq("id"))
        .agg(sum(abs(col("rank") - col("old"))))
        .first()
        .getDouble(0)
      deltas :+= delta

      ranks = newRanks
      iter += 1
      converged = delta < cfg.tol

      cfg.checkpoint match {
        case Durable(runDir, every) if iter % every == 0 || converged =>
          ranks = Supersteps
            .commit(
              spark, runDir, iter, ranks,
              Map(
                "l1_delta" -> delta,
                "n_vertices" -> g.n.toDouble,
                "n_edges" -> g.m.toDouble,
                "converged" -> (if (converged) 1.0 else 0.0)
              )
            )
            .repartition(g.parts, col("id"))
            .localCheckpoint(true)
        case _ => ()
      }
    }
    PageRankResult(ranks, iter, converged, deltas, g.m, g.n)
  }
}
