package graft.tools

import graft.core.{IterationConf, Sessions}
import graft.graph.Adjacency
import graft.graph.Adjacency.pid
import graft.ingest.Edge
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Dev-only: inspect plan growth in the CSR cogroup loop. */
object CsrProbe {
  final case class VState(id: Long, rank: Double, outdeg: Int)
  final case class Msg(dpid: Int, dst: Long, c: Double)

  def main(args: Array[String]): Unit = {
    implicit val e1: org.apache.spark.sql.Encoder[Edge] = Encoders.product[Edge]
    val spark = Sessions.local(8, "csr-probe")
    import spark.implicits._
    IterationConf.withIterationConf(spark) {
      val edges = Seq((1L,2L),(2L,3L),(3L,4L),(1L,3L),(4L,1L)).toDF("src","dst").as[Edge]
      val P = 8
      val blocks = Adjacency.csrBlocks(edges, P).cache()
      val verts = Adjacency.vertices(edges).cache()
      val n = verts.count()
      var state: Dataset[VState] = verts.map(v => VState(v.id, 1.0 / n, v.outdeg)).localCheckpoint(true)
      val blocksByPid = blocks.groupByKey(_.partId)
      for (iter <- 1 to 14) {
        val t0 = System.nanoTime()
        val msgs: Dataset[Msg] = blocksByPid
          .cogroup(state.groupByKey(v => pid(v.id, P))) { (_, bs, vs) =>
            val rm = vs.map(v => v.id -> (if (v.outdeg > 0) v.rank / v.outdeg else 0.0)).toMap
            val acc = scala.collection.mutable.Map.empty[Long, Double]
            bs.foreach { b =>
              var i = 0
              while (i < b.srcIds.length) {
                val w = rm.getOrElse(b.srcIds(i), 0.0)
                var j = b.offsets(i)
                while (j < b.offsets(i + 1)) { acc(b.dsts(j)) = acc.getOrElse(b.dsts(j), 0.0) + w; j += 1 }
                i += 1
              }
            }
            acc.iterator.map { case (d, c) => Msg(pid(d, P), d, c) }
          }
        val newState = msgs.groupByKey(_.dpid)
          .cogroup(state.groupByKey(v => pid(v.id, P))) { (_, ms, vs) =>
            val sums = ms.toSeq.groupBy(_.dst).view.mapValues(_.map(_.c).sum)
            vs.map(v => VState(v.id, 0.15 / n + 0.85 * sums.getOrElse(v.id, 0.0), v.outdeg))
          }
          .localCheckpoint(true)
        val nodes = newState.queryExecution.analyzed.collect { case p => 1 }.sum
        println(f"iter $iter nodes=$nodes wall=${(System.nanoTime() - t0) / 1e9}%.2f")
        state = newState
      }
    }
    spark.stop()
  }
}
