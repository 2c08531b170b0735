package graft.graph

import graft.SparkSpec
import graft.ingest.Edge

class CsrPageRankSpec extends SparkSpec {
  import spark.implicits._

  private def toMap(r: PageRankResult): Map[Long, Double] =
    r.ranks.collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap

  // Fixed-superstep configs: both engines run the SAME number of
  // supersteps, so trajectories must agree to float noise — a stronger
  // (and bounded-runtime) check than comparing at convergence.
  private def fixed(k: Int) = PageRankConfig(tol = 0.0, maxIter = k)

  test("CSR blocks: lossless round trip of the edge set") {
    val edges = Oracles.randomGraph(100, 400, seed = 31)
    val ds = edges.toDF("src", "dst").as[Edge]
    val blocks = Adjacency.csrBlocks(ds, 4).collect()
    val back = blocks.flatMap { b =>
      b.srcIds.indices.flatMap(i =>
        (b.offsets(i) until b.offsets(i + 1)).map(j => (b.srcIds(i), b.dsts(j))))
    }.toSet
    assert(back == edges.toSet)
    blocks.foreach { b =>
      assert(b.offsets.length == b.srcIds.length + 1)
      assert(b.offsets.last == b.dsts.length)
      assert(b.srcIds.forall(s => Adjacency.pid(s, 4) == b.partId))
    }
  }

  test("durable checkpoints: mid-run parquet round-trip leaves the trajectory bit-identical") {
    val edges = Oracles.randomGraph(200, 900, seed = 7)
    val ds = edges.toDF("src", "dst").as[Edge]
    val runDir = java.nio.file.Files.createTempDirectory("graft-csr-durable").toString
    // every=3 forces TWO mid-run reread swaps before the final commit
    val durable = CsrPageRank.run(ds,
      PageRankConfig(tol = 0.0, maxIter = 9, checkpoint = Durable(runDir, every = 3)))
    val local = CsrPageRank.run(ds, fixed(9))
    assert(toMap(durable) == toMap(local), "reread state perturbed the ranks")
    assert(Supersteps.lastCommitted(spark, runDir).contains(9))
    val committed = Supersteps.readState(spark, runDir, 9)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(committed == toMap(durable), "committed snapshot differs from the final state")
  }

  test("resume from a mid-run checkpoint == uninterrupted run (bit-identical)") {
    val edges = Oracles.randomGraph(150, 700, seed = 19)
    val ds = edges.toDF("src", "dst").as[Edge]
    val fullDir = java.nio.file.Files.createTempDirectory("graft-csr-full").toString
    val partDir = java.nio.file.Files.createTempDirectory("graft-csr-part").toString
    val full = CsrPageRank.run(ds,
      PageRankConfig(tol = 0.0, maxIter = 8, checkpoint = Durable(fullDir, every = 8)))
    // killed run: 4 of 8 supersteps committed
    CsrPageRank.run(ds,
      PageRankConfig(tol = 0.0, maxIter = 4, checkpoint = Durable(partDir, every = 4)))
    val resumed = CsrPageRank.resume(ds, partDir,
      PageRankConfig(tol = 0.0, maxIter = 8, checkpoint = Durable(partDir, every = 4)))
    assert(resumed.iterations == 8)
    assert(toMap(resumed) == toMap(full), "resumed trajectory diverged")
    // resuming when nothing is left to do returns the state unchanged
    val again = CsrPageRank.resume(ds, partDir,
      PageRankConfig(tol = 0.0, maxIter = 8, checkpoint = Durable(partDir, every = 4)))
    assert(toMap(again) == toMap(full))
  }

  test("block size cap splits partitions by edge count") {
    val edges = (0L until 50L).flatMap(i => (0L until 20L).map(j => (i, 1000 + j)))
    val ds = edges.toDF("src", "dst").as[Edge]
    val blocks = Adjacency.csrBlocks(ds, 2, maxEdgesPerBlock = 100).collect()
    assert(blocks.forall(_.dsts.length <= 120)) // cap + one src overshoot
    assert(blocks.length > 2)
  }

  test("CSR PageRank trajectory == join PageRank (8 fixed supersteps, hubs)") {
    val edges = Oracles.randomGraph(500, 3000, seed = 37)
    val ds = edges.toDF("src", "dst").as[Edge]
    val a = toMap(PageRank.run(ds, fixed(8)))
    val b = toMap(CsrPageRank.run(ds, fixed(8)))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"vertex $k: $v vs ${b(k)}") }
  }

  test("CSR PageRank matches the power-iteration oracle incl. dangling (12 supersteps)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)) // 4 dangling
    val ds = edges.toDF("src", "dst").as[Edge]
    val got = toMap(CsrPageRank.run(ds, fixed(12)))
    val want = Oracles.pageRank(edges, tol = 0.0, maxIter = 12)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"$k: $v vs ${want(k)}") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }
}
