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
    // released by GC when the result is dropped (no cache-entry leak)
    val o = oriented(edges).localCheckpoint(true)
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

  def count(edges: Dataset[Edge]): Long = triangles(edges).count()

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
