package graft.graph

import graft.core.IterationConf
import graft.ingest.Edge
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over per-partition CSR blocks with typed cogroup supersteps —
  * the engine's scale path (north rule: adjacency as CSR blocks in typed
  * Datasets).
  *
  * Per iteration:
  *  1. cogroup(blocks, state) by partId: per block, look up src ranks in
  *     a local open hash map, scan the CSR arrays, and LOCALLY COMBINE
  *     contributions per destination — so the shuffle that follows moves
  *     at most (#blocks-touching-dst) pre-combined messages per vertex,
  *     never per-edge records. A 10^6-in-degree hub receives ≤ P
  *     messages instead of 10^6 (the explicit two-phase aggregation /
  *     hub-skew plan of SURVEY.md §7.5).
  *  2. cogroup(messages, state) by partId(dst): sum per vertex, apply
  *     teleport + dangling mass, emit the new state.
  *  3. one scalar job for L1 delta + next dangling mass (DataFrame agg).
  *
  * Semantics identical to graft.graph.PageRank (tested to 1e-9); use this
  * variant when the edge set is large relative to vertices or hub-skewed.
  */
object CsrPageRank {

  import Adjacency.{CsrBlock, Vertex, pid}

  final case class VState(id: Long, rank: Double, outdeg: Int)
  final case class Msg(dpid: Int, dst: Long, c: Double)

  def run(edges: Dataset[Edge], cfg: PageRankConfig = PageRankConfig()): PageRankResult = {
    val spark = edges.sparkSession
    import spark.implicits._
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt

    IterationConf.withIterationConf(spark) {
      val blocks = Adjacency.csrBlocks(edges, P).persist(StorageLevel.MEMORY_AND_DISK)
      val m = blocks.map(b => b.dsts.length.toLong).reduce(_ + _)
      val verts = Adjacency.vertices(edges).persist(StorageLevel.MEMORY_AND_DISK)
      val n = verts.count()
      if (n == 0)
        return PageRankResult(spark.emptyDataFrame, 0, converged = true, Nil, 0L, 0L)
      val danglingCount = verts.filter(_.outdeg == 0).count()

      val alpha = cfg.alpha
      var dangling = danglingCount.toDouble / n
      var state: Dataset[VState] =
        verts.map(v => VState(v.id, 1.0 / n, v.outdeg)).localCheckpoint(true)

      var iter = 0
      var converged = false
      var deltas = Vector.empty[Double]
      val blocksByPid = blocks.groupByKey(_.partId)

      while (iter < cfg.maxIter && !converged) {
        val d = dangling // stable capture for the closure
        val msgs: Dataset[Msg] = blocksByPid
          .cogroup(state.groupByKey(v => pid(v.id, P))) { (_, bs, vs) =>
            val rankOverDeg = new java.util.HashMap[Long, Double]()
            vs.foreach(v => if (v.outdeg > 0) rankOverDeg.put(v.id, v.rank / v.outdeg))
            val acc = new java.util.HashMap[Long, Double]()
            bs.foreach { b =>
              var i = 0
              while (i < b.srcIds.length) {
                val w = rankOverDeg.getOrDefault(b.srcIds(i), 0.0)
                if (w != 0.0) {
                  var j = b.offsets(i)
                  while (j < b.offsets(i + 1)) {
                    val dst = b.dsts(j)
                    acc.merge(dst, w, (a, x) => a + x)
                    j += 1
                  }
                }
                i += 1
              }
            }
            val out = new scala.collection.mutable.ArrayBuffer[Msg](acc.size)
            acc.forEach((dst, c) => out += Msg(pid(dst, P), dst, c))
            out.iterator
          }

        val newState: Dataset[VState] = msgs
          .groupByKey(_.dpid)
          .cogroup(state.groupByKey(v => pid(v.id, P))) { (_, ms, vs) =>
            val sums = new java.util.HashMap[Long, Double]()
            ms.foreach(msg => sums.merge(msg.dst, msg.c, (a, x) => a + x))
            vs.map(v => VState(
              v.id,
              (1.0 - alpha) / n + alpha * (sums.getOrDefault(v.id, 0.0) + d / n),
              v.outdeg))
          }
          .localCheckpoint(true)

        val row = newState.toDF
          .join(state.toDF.select(col("id"), col("rank").as("old")), Seq("id"))
          .agg(
            sum(abs(col("rank") - col("old"))).as("delta"),
            coalesce(sum(when(col("outdeg") === 0, col("rank"))), lit(0.0)).as("dangling")
          ).first()
        val delta = row.getDouble(0)
        dangling = row.getDouble(1)
        deltas :+= delta

        // NOTE: do NOT unpersist the old state's checkpoint RDD here —
        // each iteration references state twice (both cogroups), and
        // unpersisting a locally-checkpointed RDD forces recompute
        // through its retained lineage, which branches into exponential
        // re-execution (measured). Old states are dereferenced and GC'd.
        state = newState
        iter += 1
        converged = delta < cfg.tol

        cfg.checkpoint match {
          case Durable(runDir, every) if iter % every == 0 || converged =>
            val before = state
            val cp = Supersteps.commit(spark, runDir, iter, state.toDF,
              Map("l1_delta" -> delta, "n_vertices" -> n.toDouble, "n_edges" -> m.toDouble,
                "dangling_mass" -> dangling, "converged" -> (if (converged) 1.0 else 0.0)))
            state = cp.as[VState].localCheckpoint(true)
            before.queryExecution.analyzed.collectFirst {
              case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
            }.foreach(_.unpersist(false))
          case _ => ()
        }
      }
      val result = state.toDF.select(col("id"), col("rank")).localCheckpoint(true)
      blocks.unpersist(false)
      verts.unpersist(false)
      PageRankResult(result, iter, converged, deltas, m, n)
    }
  }
}
