package graft.graph

import graft.ingest.Edge
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-partition CSR adjacency blocks stored in a typed Dataset — the
  * engine's scale representation of the graph (north rule): edges live
  * as compact primitive arrays inside block rows, so iterating them never
  * shuffles per-edge records; only per-vertex messages move.
  *
  * `partId = floor-mod(src, numParts)` is a PURE function of the vertex
  * id (not Spark's internal hash partitioning), so any Dataset can be
  * co-grouped with the blocks by computing the same function — the basis
  * for the cogroup-based PageRank superstep.
  *
  * Skew: a partition's edges are split into multiple blocks of at most
  * `maxEdgesPerBlock` (caps Tungsten array sizes and balances very hot
  * hash buckets); consumers must therefore merge per-pid block lists.
  */
object Adjacency {

  final case class CsrBlock(
      partId: Int,
      srcIds: Array[Long],   // distinct sorted srcs in this block
      offsets: Array[Int],   // length = srcIds.length + 1
      dsts: Array[Long]      // concatenated out-neighbors
  )

  final case class Vertex(id: Long, outdeg: Int)

  def pid(id: Long, numParts: Int): Int = {
    val m = (id % numParts).toInt
    if (m < 0) m + numParts else m
  }

  /** Build CSR blocks from an edge Dataset. One shuffle (repartition by
    * pid(src)), then a CATALYST sort-within-partitions (external, spills
    * to disk) and a streaming single-pass block build off the sorted
    * iterator — the task never buffers its whole partition, so memory is
    * bounded by `maxEdgesPerBlock` regardless of partition size (the
    * 10^12-edge requirement; an `it.toArray` here would be an executor
    * OOM, not a slowdown).
    */
  def csrBlocks(
      edges: Dataset[Edge],
      numParts: Int,
      maxEdgesPerBlock: Int = 4 << 20
  ): Dataset[CsrBlock] = {
    val spark = edges.sparkSession
    implicit val enc = Encoders.product[CsrBlock]
    implicit val rowEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong)
    val P = numParts
    edges.toDF()
      .select(pmod(col("src"), lit(P.toLong)).cast("int").as("partId"), col("src"), col("dst"))
      // rows with equal pid(src) land in ONE Spark partition (a Spark
      // partition may hold several pids — Spark re-hashes the expression
      // — so blocks are cut per pid group below, not per partition)
      .repartition(P, col("partId"))
      .sortWithinPartitions("partId", "src", "dst")
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        new Iterator[CsrBlock] {
          private val in = it.buffered
          def hasNext: Boolean = in.hasNext
          def next(): CsrBlock = {
            val part = in.head._1
            val srcs = scala.collection.mutable.ArrayBuffer.empty[Long]
            val offs = scala.collection.mutable.ArrayBuffer[Int](0)
            val ds = scala.collection.mutable.ArrayBuffer.empty[Long]
            // one block of at most maxEdgesPerBlock edges within this pid,
            // never splitting mid-src unless a single src exceeds the cap
            while (in.hasNext && in.head._1 == part && ds.length < maxEdgesPerBlock) {
              val s = in.head._2
              srcs += s
              while (in.hasNext && in.head._1 == part && in.head._2 == s) {
                ds += in.next()._3
              }
              offs += ds.length
            }
            CsrBlock(part, srcs.toArray, offs.toArray, ds.toArray)
          }
        }
      }
  }

  /** Vertex table (id, outdeg) for the same edge set — every endpoint,
    * outdeg 0 for pure sinks.
    */
  def vertices(edges: Dataset[Edge]): Dataset[Vertex] = {
    val spark = edges.sparkSession
    implicit val enc = Encoders.product[Vertex]
    val verts = edges.toDF().select(col("src").as("id"))
      .union(edges.toDF().select(col("dst").as("id"))).distinct()
    val outdeg = edges.toDF().groupBy(col("src").as("id")).agg(count(lit(1)).cast("int").as("outdeg"))
    verts.join(outdeg, Seq("id"), "left")
      .na.fill(0, Seq("outdeg"))
      .select(col("id"), col("outdeg"))
      .as[Vertex]
  }

  /** (max, avg) in-degree — skew diagnostics for choosing salt factors. */
  def degreeStats(edges: Dataset[Edge]): (Long, Double) = {
    val r = edges.toDF().groupBy(col("dst")).agg(count(lit(1)).as("d"))
      .agg(max("d"), avg("d")).first()
    (r.getLong(0), r.getDouble(1))
  }
}
