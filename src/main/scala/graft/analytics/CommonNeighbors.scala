package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor metrics for vertex pairs: co-citation (shared
  * in-neighbors) and bibliographic coupling (shared out-neighbors), with
  * raw / cosine / jaccard scores.
  *
  * Reference semantics (create_field/extract_link_features.py:189-201,
  * 266-267):
  *   raw     = |A ∩ B|
  *   cosine  = 0 if either list empty, else raw / sqrt(|A|·|B|)
  *   jaccard = 0 if union empty,       else raw / |A ∪ B|
  * where |A ∪ B| = |A| + |B| − raw on deduped neighbor lists.
  *
  * Scale design: computed as JOINS, never by collecting adjacency arrays —
  * the intersection count per pair is a self-join of the edge table on the
  * shared endpoint followed by a pair-count aggregation (this is the
  * triangle-count primitive, SURVEY.md §2.4 A10). Degree terms come from a
  * degree table broadcast/shuffled on the pair keys. A hub with 10^5
  * neighbors contributes O(deg²) wedge rows in the general all-pairs case;
  * restricted to the supplied candidate `pairs`, the semi-join on pairs
  * prunes first.
  */
object CommonNeighbors {

  /** For each (a, b) in `pairs`, metrics over shared IN-neighbors of a and
    * b in `edges(src, dst)` (co-citation when edges = citations).
    *
    * When `multisetEdges` is given (edge rows WITH author-fanout
    * duplicates), cosine denominators use the duplicate-bearing neighbor
    * LIST lengths — exactly the reference, whose `edges_by_cited` /
    * `edges_by_citing` lists (extract_link_features.py:30-31) keep one
    * entry per (pair, author) row while raw/jaccard dedup through sets
    * (compute_metrics, :189-201).
    */
  def coCitation(edges: DataFrame, pairs: DataFrame, multisetEdges: DataFrame = null): DataFrame =
    metrics(
      edges.select(col("dst").as("node"), col("src").as("nbr")), pairs,
      if (multisetEdges == null) null
      else multisetEdges.select(col("dst").as("node"), col("src").as("nbr")))

  /** Shared OUT-neighbor metrics (bibliographic coupling). */
  def bibCoupling(edges: DataFrame, pairs: DataFrame, multisetEdges: DataFrame = null): DataFrame =
    metrics(
      edges.select(col("src").as("node"), col("dst").as("nbr")), pairs,
      if (multisetEdges == null) null
      else multisetEdges.select(col("src").as("node"), col("dst").as("nbr")))

  /** adjacency(node, nbr) + pairs(a, b) -> (a, b, raw, cosine, jaccard).
    * `multisetAdjacency`, when non-null, supplies the duplicate-bearing
    * rows whose per-node COUNT is the cosine denominator (reference list
    * lengths); raw and jaccard always use the deduped set semantics.
    */
  def metrics(adjacency: DataFrame, pairs: DataFrame, multisetAdjacency: DataFrame = null): DataFrame = {
    val adj = adjacency.distinct()
    val degSource = if (multisetAdjacency == null) adj else multisetAdjacency
    val deg = degSource.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val setDeg = adj.groupBy(col("node")).agg(count(lit(1)).as("sdeg"))

    // raw = |N(a) ∩ N(b)|: join adjacency to itself through the pair list.
    val aSide = adj.select(col("node").as("a"), col("nbr"))
    val bSide = adj.select(col("node").as("b"), col("nbr"))
    val raw = pairs
      .join(aSide, "a")
      .join(bSide, Seq("b", "nbr"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("raw"))

    val base = pairs
      .join(raw, Seq("a", "b"), "left")
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), Seq("a"), "left")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), Seq("b"), "left")
    // set-cardinality degrees for the jaccard union; identical to deg when
    // no multiset adjacency was supplied (skip the two extra joins then)
    val withSet =
      if (multisetAdjacency == null)
        base.withColumn("sdeg_a", col("deg_a")).withColumn("sdeg_b", col("deg_b"))
      else base
        .join(setDeg.withColumnRenamed("node", "a").withColumnRenamed("sdeg", "sdeg_a"), Seq("a"), "left")
        .join(setDeg.withColumnRenamed("node", "b").withColumnRenamed("sdeg", "sdeg_b"), Seq("b"), "left")
    withSet
      .select(
        col("a"),
        col("b"),
        coalesce(col("raw"), lit(0L)).as("raw"),
        when(coalesce(col("deg_a"), lit(0L)) <= 0 || coalesce(col("deg_b"), lit(0L)) <= 0, lit(0.0))
          .otherwise(coalesce(col("raw"), lit(0L)) / sqrt(col("deg_a") * col("deg_b")))
          .as("cosine"),
        when(
          coalesce(col("sdeg_a"), lit(0L)) + coalesce(col("sdeg_b"), lit(0L)) - coalesce(col("raw"), lit(0L)) <= 0,
          lit(0.0)
        ).otherwise(
          coalesce(col("raw"), lit(0L)) /
            (coalesce(col("sdeg_a"), lit(0L)) + coalesce(col("sdeg_b"), lit(0L)) - coalesce(col("raw"), lit(0L)))
        ).as("jaccard")
      )
  }
}
