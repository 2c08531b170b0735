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
    */
  def coCitation(edges: DataFrame, pairs: DataFrame): DataFrame =
    metrics(edges.select(col("dst").as("node"), col("src").as("nbr")), pairs)

  /** Shared OUT-neighbor metrics (bibliographic coupling). */
  def bibCoupling(edges: DataFrame, pairs: DataFrame): DataFrame =
    metrics(edges.select(col("src").as("node"), col("dst").as("nbr")), pairs)

  /** adjacency(node, nbr) + pairs(a, b) -> (a, b, raw, cosine, jaccard). */
  def metrics(adjacency: DataFrame, pairs: DataFrame): DataFrame = {
    val adj = adjacency.distinct()
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))

    // raw = |N(a) ∩ N(b)|: join adjacency to itself through the pair list.
    val aSide = adj.select(col("node").as("a"), col("nbr"))
    val bSide = adj.select(col("node").as("b"), col("nbr"))
    val raw = pairs
      .join(aSide, "a")
      .join(bSide, Seq("b", "nbr"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("raw"))

    pairs
      .join(raw, Seq("a", "b"), "left")
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), Seq("a"), "left")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), Seq("b"), "left")
      .select(
        col("a"),
        col("b"),
        coalesce(col("raw"), lit(0L)).as("raw"),
        when(coalesce(col("deg_a"), lit(0L)) <= 0 || coalesce(col("deg_b"), lit(0L)) <= 0, lit(0.0))
          .otherwise(coalesce(col("raw"), lit(0L)) / sqrt(col("deg_a") * col("deg_b")))
          .as("cosine"),
        when(
          coalesce(col("deg_a"), lit(0L)) + coalesce(col("deg_b"), lit(0L)) - coalesce(col("raw"), lit(0L)) <= 0,
          lit(0.0)
        ).otherwise(
          coalesce(col("raw"), lit(0L)) /
            (coalesce(col("deg_a"), lit(0L)) + coalesce(col("deg_b"), lit(0L)) - coalesce(col("raw"), lit(0L)))
        ).as("jaccard")
      )
  }
}
