package graft.graph

import graft.core.IterationConf
import graft.ingest.Edge
import org.apache.spark.{HashPartitioner, Partitioner}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over grid-partitioned, index-resolved CSR blocks — the
  * engine's scale path (north rule: adjacency as CSR blocks in typed
  * Datasets; public precedent for the 2D layout: GraphX EdgePartition2D /
  * PowerGraph vertex-cut, both published designs).
  *
  * Physical design, built once in prepare and never reshuffled:
  *
  *  - Vertex state: ONE `VBlock` per partition (pid = id mod P) holding
  *    parallel primitive arrays (ids sorted, outdeg, ranks). Only the
  *    rank array is re-allocated per iteration; ids/outdeg are shared by
  *    reference across iterations.
  *  - Adjacency: `IdxBlock`s keyed by (source partition, DESTINATION
  *    partition) — a grid cell of the adjacency matrix — with BOTH
  *    endpoints pre-resolved to dense per-partition indexes (srcIdx,
  *    nbrIdx). Blocks are sorted by dpid within each source partition
  *    and capped at maxEdgesPerBlock (streaming build off an external
  *    sort — bounded task memory at any scale).
  *
  * The iteration hot loop is therefore hash-free and allocation-light:
  *
  *  1. zipPartitions(blocks, state): for each destination partition's
  *     contiguous block run, accumulate `ranks[srcIdx]/outdeg[srcIdx]`
  *     into ONE reused dense double array indexed by nbrIdx, then emit
  *     the nonzero (idx, sum) pairs as a primitive bundle. The shuffle
  *     moves at most P bundles per source partition — pre-combined
  *     messages, never per-edge records; a 10^6-in-degree hub receives
  *     <= P messages (two-phase aggregation, SURVEY.md §7.5). (An
  *     open-addressing-map variant of this combine measured ~4 GB of
  *     map churn per iteration at 132M edges — the dense grid layout
  *     exists to make the combine zero-allocation.)
  *  2. partitionBy(P) on the bundle's dpid — the only shuffle, ~12 bytes
  *     per combined entry (int idx + double sum).
  *  3. zipPartitions(state, bundles): dense-add bundles into a contribs
  *     array, apply teleport + dangling mass, emit the new state; the
  *     SAME pass accumulates the L1 delta and next dangling mass into
  *     accumulators — ONE job, ONE shuffle per iteration total.
  *     (Accumulator caveat: a re-run task double-counts — that can only
  *     perturb the convergence *test*, never the rank values.)
  *
  * RDD usage is forced here: a Dataset `groupByKey(_.partId).cogroup`
  * re-shuffles the static block side EVERY superstep because the lambda
  * key is opaque to Catalyst (measured 6x slower than the join path in
  * round 1), while a partitioner-pinned zipPartitions provably moves
  * zero block bytes.
  *
  * Semantics identical to graft.graph.PageRank (tested to 1e-9); use this
  * variant when the edge set is large relative to vertices or hub-skewed.
  */
object CsrPageRank {

  import Adjacency.pid

  /** One partition's vertex state: parallel arrays sorted by id. */
  final case class VBlock(pid: Int, ids: Array[Long], outdeg: Array[Int], ranks: Array[Double])

  /** Grid cell (spid, dpid) of the adjacency: srcIdx/nbrIdx are dense
    * indexes into the source/destination partitions' VBlock arrays.
    */
  final case class IdxBlock(
      spid: Int,
      dpid: Int,
      srcIdx: Array[Int],   // ascending within the block
      offsets: Array[Int],  // length = srcIdx.length + 1
      nbrIdx: Array[Int])

  /** Pre-combined messages for one destination partition. */
  final case class MsgBlock(dpid: Int, idx: Array[Int], sums: Array[Double])

  private final class PidPartitioner(p: Int) extends Partitioner {
    def numPartitions: Int = p
    def getPartition(key: Any): Int = key.asInstanceOf[(Int, Int, Int, Int)]._1
    override def equals(o: Any): Boolean = o match {
      case x: PidPartitioner => x.numPartitions == p
      case _ => false
    }
    override def hashCode: Int = p
  }

  def run(edges: Dataset[Edge], cfg: PageRankConfig = PageRankConfig()): PageRankResult = {
    val spark = edges.sparkSession
    import spark.implicits._
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val part = new HashPartitioner(P) // Int keys in [0,P): partition index == pid

    IterationConf.withIterationConf(spark) {
      val prepT0 = System.nanoTime()

      // --- vertex state: one VBlock per partition, ids sorted ------------
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
        return PageRankResult(spark.emptyDataFrame, 0, converged = true, Nil, 0L, 0L)
      }
      // per-partition vertex counts — tiny (P ints), captured by closures
      val partSizes = {
        val arr = new Array[Int](P)
        state.map(b => (b.pid, b.ids.length)).collect().foreach { case (p, s) => arr(p) = s }
        arr
      }
      val maxPartSize = partSizes.max

      // --- adjacency grid: dst resolved by a pinned zipPartitions, src
      // resolved during the block build (both ends end up as dense ints) -
      val byDst: RDD[(Int, (Long, Int))] = edges.rdd // (pid(dst), (src, dst))
        .map(e => (pid(e.dst, P), (e.src, 0L, e.dst)))
        .partitionBy(part)
        .zipPartitions(state, preservesPartitioning = true) { (es, vs) =>
          vs.toSeq.headOption match {
            case None => Iterator.empty
            case Some(vb) =>
              es.map { case (dp, (src, _, dst)) =>
                (dp, (src, java.util.Arrays.binarySearch(vb.ids, dst)))
              }
          }
        }
      // key (spid, dpid, src-as-int-pair) sorted externally; partitioned by spid
      val sortedCells = byDst
        .map { case (dp, (src, didx)) =>
          ((pid(src, P), dp, (src >>> 32).toInt, src.toInt), didx)
        }
        .repartitionAndSortWithinPartitions(new PidPartitioner(P))
        .map { case ((sp, dp, hi, lo), didx) => (sp, dp, (hi.toLong << 32) | (lo.toLong & 0xffffffffL), didx) }
      val blocks: RDD[IdxBlock] = sortedCells
        .zipPartitions(state, preservesPartitioning = true) { (cells, vs) =>
          vs.toSeq.headOption match {
            case None => Iterator.empty
            case Some(vb) =>
              val maxEdgesPerBlock = 4 << 20
              val in = cells.buffered
              new Iterator[IdxBlock] {
                def hasNext: Boolean = in.hasNext
                def next(): IdxBlock = {
                  val sp = in.head._1
                  val dp = in.head._2
                  val sidx = scala.collection.mutable.ArrayBuffer.empty[Int]
                  val offs = scala.collection.mutable.ArrayBuffer[Int](0)
                  val nis = scala.collection.mutable.ArrayBuffer.empty[Int]
                  while (in.hasNext && in.head._2 == dp && nis.length < maxEdgesPerBlock) {
                    val s = in.head._3
                    // src's own dense index via binary search in this
                    // partition's sorted ids (prepare-only cost)
                    sidx += java.util.Arrays.binarySearch(vb.ids, s)
                    while (in.hasNext && in.head._2 == dp && in.head._3 == s) {
                      nis += in.next()._4
                    }
                    offs += nis.length
                  }
                  IdxBlock(sp, dp, sidx.toArray, offs.toArray, nis.toArray)
                }
              }
          }
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = blocks.map(_.nbrIdx.length.toLong).fold(0L)(_ + _)

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
        val sizes = partSizes
        val maxSz = maxPartSize
        val msgs: RDD[(Int, MsgBlock)] = blocks
          .zipPartitions(state, preservesPartitioning = false) { (bs, vs) =>
            vs.toSeq.headOption match {
              case None => Iterator.empty
              case Some(vb) =>
                // one reused dense accumulator; blocks arrive sorted by dpid
                val contribs = new Array[Double](maxSz)
                val out = scala.collection.mutable.ArrayBuffer.empty[(Int, MsgBlock)]
                var curDp = -1
                def flush(): Unit = if (curDp >= 0) {
                  val nq = sizes(curDp)
                  var nz = 0
                  var i = 0
                  while (i < nq) { if (contribs(i) != 0.0) nz += 1; i += 1 }
                  if (nz > 0) {
                    val idx = new Array[Int](nz)
                    val sums = new Array[Double](nz)
                    var w = 0; i = 0
                    while (i < nq) {
                      if (contribs(i) != 0.0) { idx(w) = i; sums(w) = contribs(i); w += 1 }
                      i += 1
                    }
                    out += ((curDp, MsgBlock(curDp, idx, sums)))
                  }
                  java.util.Arrays.fill(contribs, 0, nq, 0.0)
                }
                bs.foreach { b =>
                  if (b.dpid != curDp) { flush(); curDp = b.dpid }
                  var i = 0
                  while (i < b.srcIdx.length) {
                    val si = b.srcIdx(i)
                    val od = vb.outdeg(si)
                    if (od > 0) {
                      val w = vb.ranks(si) / od
                      var j = b.offsets(i)
                      while (j < b.offsets(i + 1)) { contribs(b.nbrIdx(j)) += w; j += 1 }
                    }
                    i += 1
                  }
                }
                flush()
                out.iterator
            }
          }
          .partitionBy(part) // the single per-iteration shuffle

        val deltaAcc = sc.doubleAccumulator(s"l1_delta_iter_$iter")
        val danglingAcc = sc.doubleAccumulator(s"dangling_iter_$iter")
        val newState: RDD[VBlock] = state
          .zipPartitions(msgs, preservesPartitioning = true) { (vs, ms) =>
            vs.map { vb =>
              // dense receive: bundle adds land in an array bounded by
              // this partition's vertex count, no hashing
              val contribs = new Array[Double](vb.ids.length)
              ms.foreach { case (_, mb) =>
                var i = 0
                while (i < mb.idx.length) { contribs(mb.idx(i)) += mb.sums(i); i += 1 }
              }
              val newRanks = new Array[Double](vb.ids.length)
              var delta = 0.0
              var dang = 0.0
              var k = 0
              while (k < vb.ids.length) {
                val r = (1.0 - alpha) / nn + alpha * (contribs(k) + d / nn)
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
