package graft.graph

import graft.ingest.Edge
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting over the undirected simple graph, DataFrame-only.
  *
  * Reference precedent: the co-citation / bibliographic-coupling
  * common-neighbor metrics (create_field/extract_link_features.py:189-201,
  * 266-267) — a triangle through edge (u,v) IS a common neighbor of u and
  * v; this operator is their graph-wide generalization (citation-clique
  * density).
  *
  * Skew plan (SURVEY.md §7.5, standard degree-orientation trick): rank
  * vertices by (degree, id) and orient every edge low→high. Then every
  * wedge is enumerated at its lowest-degree vertex, so a hub of degree d
  * contributes O(d) wedges only through its low-degree endpoints — the
  * O(d²) hub blow-up disappears. The closing-edge check is a semi-ish
  * inner join against the oriented edge set.
  */
object TriangleCount {

  /** Canonical oriented edge set: (a ≺ b) under (deg, id) order. */
  private def oriented(edges: Dataset[Edge]): DataFrame = {
    val und = edges.toDF()
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und
      .select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    und
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b")
      )
  }

  /** All triangles as (x, y, z) vertex triples (each exactly once). */
  def triangles(edges: Dataset[Edge]): DataFrame = {
    // eager localCheckpoint instead of persist: materialized once, blocks
    // released by GC when the result is dropped (no cache-entry leak).
    //
    // Repartition BEFORE checkpointing (guide §2.5 input skew / §2.6):
    // the oriented edge set is small after AQE coalescing (measured: 3
    // partitions at sf0.1), but the wedge enumeration downstream explodes
    // each partition by O(outdeg) — a 5.2 s 3-task stage on a 32-core
    // box. Hash-partitioning by the wedge pivot `a` restores full
    // parallelism and co-partitions the self-join on `a`.
    val parts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val o = oriented(edges).repartition(parts, col("a")).localCheckpoint(true)
    val e1 = o.select(col("a"), col("b").as("x"))
    val e2 = o.select(col("a"), col("b").as("y"))
    // wedges at the low vertex; x ≺ y not known in (deg,id) order here, so
    // dedupe by requiring x < y on raw id after canonicalizing the pair.
    val wedges = e1
      .join(e2, "a")
      .filter(col("x") < col("y"))
      .select(col("a"), col("x"), col("y"))
    // closing edge (x,y) exists in oriented set in either orientation
    val closing = o.select(col("a").as("x"), col("b").as("y"))
      .union(o.select(col("b").as("x"), col("a").as("y")))
    wedges.join(closing, Seq("x", "y"), "left_semi")
  }

  /** Total triangle count as a 1-row DataFrame (`n_triangles`: bigint)
    * via the edge-iterator ("compact-forward") algorithm: per-vertex
    * SORTED successor arrays under the same (deg, id) orientation, one
    * row per oriented edge (a, b), count = Σ |N⁺(a) ∩ N⁺(b)|. Each
    * triangle {a ≺ b ≺ c} is counted exactly once, at its lowest edge
    * (a, b) — identical count to `triangles(...).count()` by
    * construction.
    *
    * Why a second formulation (guide §1.2 step 1): the wedge plan
    * materializes Σ_a C(outdeg⁺(a), 2) wedge rows and probes each
    * against the closing-edge hash relation (measured at sf0.1: ~35M
    * wedge rows, 4.4 s across 32 tasks); this plan does ONE sorted-array
    * intersection per EDGE (1.2M rows at sf0.1) against a broadcast
    * adjacency of |V| rows. Orientation bounds |N⁺| by O(√m), so both
    * the arrays and the intersection cost stay bounded at any scale —
    * the same hub-killer argument, with none of the wedge blow-up.
    * `triangles` remains the path that LISTS the triples (perVertex).
    */
  def countDf(edges: Dataset[Edge]): DataFrame = {
    val parts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // LAZY checkpoint: all three consumers (edge stream, both adjacency
    // sides) sit under the single count action, whose stages are ordered
    // by their shuffle dependencies — the first stage to touch a
    // partition computes and caches it, the rest read blocks. One job
    // total instead of checkpoint-then-count (r07).
    val o = oriented(edges).repartition(parts, col("a")).localCheckpoint(false)
    val adj = o.groupBy(col("a")).agg(sort_array(collect_list(col("b"))).as("nbrs"))
    val na = adj.select(col("a"), col("nbrs").as("na_nbrs"))
    val nb = adj.select(col("a").as("b"), col("nbrs").as("nb_nbrs"))
    // an edge whose head has no successors contributes 0 — the inner
    // join dropping it leaves the sum unchanged
    o.join(na, "a").join(nb, "b")
      .select(size(array_intersect(col("na_nbrs"), col("nb_nbrs"))).cast("long").as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("n_triangles"))
  }

  def count(edges: Dataset[Edge]): Long = countDf(edges).first().getLong(0)

  /** Per-vertex triangle counts (vertices in no triangle get 0). */
  def perVertex(edges: Dataset[Edge]): DataFrame = {
    val spark = edges.sparkSession
    val verts = edges.toDF().select(col("src").as("id"))
      .union(edges.toDF().select(col("dst").as("id"))).distinct()
    val t = triangles(edges)
    val exploded = t.select(explode(array(col("a"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    verts.join(exploded, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
