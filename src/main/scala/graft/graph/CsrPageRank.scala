package graft.graph

import graft.core.IterationConf
import graft.ingest.Edge
import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over per-partition CSR blocks — the engine's scale path
  * (north rule: adjacency as CSR blocks in typed Datasets).
  *
  * The CSR blocks are BUILT and STORED as a typed `Dataset[CsrBlock]`
  * (Adjacency.csrBlocks); the iteration loop pins them once to a
  * `HashPartitioner(P)` keyed by `partId` and never moves them again.
  * This is the one place the engine drops to the RDD layer, and it is
  * forced: a Dataset `groupByKey(_.partId).cogroup` re-shuffles the
  * static block side EVERY superstep because the lambda key is opaque to
  * Catalyst (measured 6x slower than the join path in round 1), while a
  * partitioner-pinned zipPartitions provably moves zero block bytes.
  *
  * Vertex state is likewise blocked: ONE `VBlock` per partition holding
  * sorted primitive arrays (ids, outdeg, ranks). Only the rank array is
  * re-allocated per iteration — ids/outdeg are shared by reference across
  * iterations — and all hot loops are primitive two-pointer merge scans
  * (block srcIds and state ids are both sorted) plus one open-addressing
  * long->double map for message accumulation. No per-vertex objects, no
  * boxing (measured ~4x faster per iteration than the boxed-HashMap
  * cogroup design at 16.5M edges).
  *
  * Per iteration — ONE job, ONE shuffle:
  *  1. zipPartitions(blocks, state): merge-scan src ranks, locally combine
  *     contributions per destination, emit ONE primitive-array message
  *     bundle per destination partition — the shuffle moves at most
  *     P bundles of (distinct dsts touched) entries, never per-edge
  *     records. A 10^6-in-degree hub receives <= P pre-combined messages
  *     (the explicit two-phase aggregation / hub-skew plan, SURVEY.md §7.5).
  *  2. partitionBy(P) on the bundle's dpid — the only shuffle.
  *  3. zipPartitions(state, bundles): sum per vertex, apply teleport +
  *     dangling mass, emit the new state; the SAME pass accumulates the
  *     L1 delta and next-iteration dangling mass into accumulators, so no
  *     separate scalar job runs. (Accumulator caveat: a re-run task would
  *     double-count — that can only perturb the convergence *test*, never
  *     the rank values; Durable mode re-derives metrics at commit.)
  *
  * Semantics identical to graft.graph.PageRank (tested to 1e-9); use this
  * variant when the edge set is large relative to vertices or hub-skewed.
  */
object CsrPageRank {

  import Adjacency.{CsrBlock, pid}

  /** One partition's vertex state: parallel arrays sorted by id. */
  final case class VBlock(pid: Int, ids: Array[Long], outdeg: Array[Int], ranks: Array[Double])

  /** Pre-combined messages for one destination partition. */
  final case class MsgBlock(dpid: Int, dsts: Array[Long], sums: Array[Double])

  def run(edges: Dataset[Edge], cfg: PageRankConfig = PageRankConfig()): PageRankResult = {
    val spark = edges.sparkSession
    import spark.implicits._
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val part = new HashPartitioner(P) // Int keys in [0,P): partition index == pid

    IterationConf.withIterationConf(spark) {
      val prepT0 = System.nanoTime()
      val blocksDs = Adjacency.csrBlocks(edges, P)
      // Pin blocks: partition i holds exactly the blocks with partId == i.
      val blocks: RDD[CsrBlock] = blocksDs.rdd
        .map(b => (b.partId, b))
        .partitionBy(part)
        .map(_._2)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = blocks.map(_.dsts.length.toLong).fold(0L)(_ + _)

      // Vertex state: one VBlock per partition, ids sorted (in-task sort of
      // n/P ids — bounded by the vertex-partition size, not the edge count).
      var state: RDD[VBlock] = Adjacency.vertices(edges).rdd
        .map(v => (pid(v.id, P), v))
        .partitionBy(part)
        .mapPartitionsWithIndex({ (i, it) =>
          val vs = it.map(_._2).toArray
          if (vs.isEmpty) Iterator.empty
          else {
            java.util.Arrays.sort(vs, Ordering.by((v: Adjacency.Vertex) => v.id))
            Iterator.single(VBlock(i, vs.map(_.id), vs.map(_.outdeg), new Array[Double](vs.length)))
          }
        }, preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val counts = state.map(b => (b.ids.length.toLong, b.outdeg.count(_ == 0).toLong))
        .fold((0L, 0L))((a, b) => (a._1 + b._1, a._2 + b._2))
      val n = counts._1
      val danglingCount = counts._2
      if (n == 0) {
        blocks.unpersist(false)
        return PageRankResult(spark.emptyDataFrame, 0, converged = true, Nil, 0L, 0L)
      }
      val r0 = 1.0 / n
      state = materialize(state.mapPartitions(
        _.map(b => b.copy(ranks = Array.fill(b.ids.length)(r0))), preservesPartitioning = true))

      val prepSecs = (System.nanoTime() - prepT0) / 1e9
      val loopT0 = System.nanoTime()
      val sc = spark.sparkContext
      val alpha = cfg.alpha
      var dangling = danglingCount.toDouble / n
      var iter = 0
      var converged = false
      var deltas = Vector.empty[Double]

      while (iter < cfg.maxIter && !converged) {
        val d = dangling // stable capture
        val nn = n
        val msgs: RDD[(Int, MsgBlock)] = blocks
          .zipPartitions(state, preservesPartitioning = false) { (bs, vs) =>
            vs.toSeq.headOption match {
              case None => Iterator.empty
              case Some(vb) =>
                val acc = new LongDoubleMap(1 << 12)
                bs.foreach { b =>
                  // two-pointer merge: b.srcIds and vb.ids are both sorted
                  var i = 0; var k = 0
                  while (i < b.srcIds.length) {
                    val s = b.srcIds(i)
                    while (k < vb.ids.length && vb.ids(k) < s) k += 1
                    if (k < vb.ids.length && vb.ids(k) == s && vb.outdeg(k) > 0) {
                      val w = vb.ranks(k) / vb.outdeg(k)
                      var j = b.offsets(i)
                      while (j < b.offsets(i + 1)) {
                        acc.addValue(b.dsts(j), w)
                        j += 1
                      }
                    }
                    i += 1
                  }
                }
                // bucket the combined sums into one bundle per dest partition
                val cnt = new Array[Int](P)
                acc.foreachEntry((dst, _) => cnt(pid(dst, P)) += 1)
                val dsts = Array.tabulate(P)(p => new Array[Long](cnt(p)))
                val sums = Array.tabulate(P)(p => new Array[Double](cnt(p)))
                val fill = new Array[Int](P)
                acc.foreachEntry { (dst, c) =>
                  val p = pid(dst, P)
                  dsts(p)(fill(p)) = dst; sums(p)(fill(p)) = c; fill(p) += 1
                }
                (0 until P).iterator
                  .filter(p => cnt(p) > 0)
                  .map(p => (p, MsgBlock(p, dsts(p), sums(p))))
            }
          }
          .partitionBy(part) // the single per-iteration shuffle

        val deltaAcc = sc.doubleAccumulator(s"l1_delta_iter_$iter")
        val danglingAcc = sc.doubleAccumulator(s"dangling_iter_$iter")
        val newState: RDD[VBlock] = state
          .zipPartitions(msgs, preservesPartitioning = true) { (vs, ms) =>
            vs.map { vb =>
              val sums = new LongDoubleMap(1 << 12)
              ms.foreach { case (_, mb) =>
                var i = 0
                while (i < mb.dsts.length) { sums.addValue(mb.dsts(i), mb.sums(i)); i += 1 }
              }
              val newRanks = new Array[Double](vb.ids.length)
              var delta = 0.0
              var dang = 0.0
              var k = 0
              while (k < vb.ids.length) {
                val r = (1.0 - alpha) / nn + alpha * (sums.getOrElse(vb.ids(k), 0.0) + d / nn)
                delta += math.abs(r - vb.ranks(k))
                if (vb.outdeg(k) == 0) dang += r
                newRanks(k) = r
                k += 1
              }
              deltaAcc.add(delta)
              danglingAcc.add(dang)
              vb.copy(ranks = newRanks) // ids/outdeg shared by reference
            }
          }
        materialize(newState) // the ONE job: msg stage + state stage

        val delta = deltaAcc.value.doubleValue()
        dangling = danglingAcc.value.doubleValue()
        deltas :+= delta
        state.unpersist(false)
        state = newState
        iter += 1
        converged = delta < cfg.tol

        cfg.checkpoint match {
          case Durable(runDir, every) if iter % every == 0 || converged =>
            val committed = Supersteps.commit(spark, runDir, iter,
              state.flatMap(b => b.ids.indices.iterator.map(k => (b.ids(k), b.ranks(k), b.outdeg(k))))
                .toDF("id", "rank", "outdeg"),
              Map("l1_delta" -> delta, "n_vertices" -> n.toDouble, "n_edges" -> m.toDouble,
                "dangling_mass" -> dangling, "converged" -> (if (converged) 1.0 else 0.0)))
            val reread = committed
              .select(col("id"), col("rank"), col("outdeg"))
              .as[(Long, Double, Int)].rdd
              .map(t => (pid(t._1, P), t))
              .partitionBy(part)
              .mapPartitionsWithIndex({ (i, it) =>
                val vs = it.map(_._2).toArray
                if (vs.isEmpty) Iterator.empty
                else {
                  java.util.Arrays.sort(vs, Ordering.by((t: (Long, Double, Int)) => t._1))
                  Iterator.single(VBlock(i, vs.map(_._1), vs.map(_._3), vs.map(_._2)))
                }
              }, preservesPartitioning = true)
            materialize(reread)
            state.unpersist(false)
            state = reread
          case _ => ()
        }
      }
      val result = state
        .flatMap(b => b.ids.indices.iterator.map(k => (b.ids(k), b.ranks(k))))
        .toDF("id", "rank").localCheckpoint(true)
      blocks.unpersist(false)
      state.unpersist(false)
      PageRankResult(result, iter, converged, deltas, m, n,
        prepareSeconds = prepSecs, loopSeconds = (System.nanoTime() - loopT0) / 1e9)
    }
  }

  /** Persist + truncate lineage + materialize in one action. */
  private def materialize[T](rdd: RDD[T]): RDD[T] = {
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.localCheckpoint()
    rdd.count()
    rdd
  }
}
