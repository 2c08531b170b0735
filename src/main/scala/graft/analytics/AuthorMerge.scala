package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Author-merge remap — the consumer of NameMatch's reviewed pairs
  * (create_field/merge_author.py:22-58): apply a (keep_id <- drop_id)
  * match table to the paper_author relation, drop merged author rows,
  * and recompute the per-author stats the reference refreshes in place:
  * PaperCount, CitationCount (sum of merged paper citationCounts) and
  * hIndex (#(i: c_i > i), merge_author.py:53-57 — identical to the
  * HIndex.perGroup cutoff).
  *
  * The reference applies pairs one-by-one with in-place pandas updates,
  * so chains (c->b, b->a) resolve transitively; the engine computes the
  * same fixpoint with pointer-jumping joins (O(log chain) rounds, each a
  * broadcast-size join on the tiny match table — never a driver loop over
  * rows).
  */
object AuthorMerge {

  /** Resolve (id2 -> id1) pairs to their transitive roots.
    * Input must be acyclic after self-pair removal (reviewed merges are).
    */
  def resolveRoots(matches: DataFrame): DataFrame = {
    var m = matches
      .select(col("id2").as("from"), col("id1").as("to"))
      .filter(col("from") =!= col("to"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = true
    var guard = 0
    while (changed && guard < 64) {
      // pointer jumping: from -> to becomes from -> root(to) if to itself maps
      val jumped = m.as("x")
        .join(m.as("y"), col("x.to") === col("y.from"), "left")
        .select(col("x.from").as("from"), coalesce(col("y.to"), col("x.to")).as("to"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = jumped.join(m, Seq("from", "to"), "left_anti").limit(1).count() > 0
      m.unpersist(false)
      m = jumped
      guard += 1
    }
    m
  }

  /** Apply the merges: returns (paperAuthor', authorStats') where
    * paperAuthor' has drop-ids rewritten to keep-ids and authorStats' has
    * one row per surviving author with recomputed stats.
    *
    * @param paperAuthors (paperID, authorID)
    * @param papers       (paperID, citationCount)
    * @param matches      (id1 keep, id2 drop)
    */
  def apply(paperAuthors: DataFrame, papers: DataFrame, matches: DataFrame): (DataFrame, DataFrame) = {
    val roots = resolveRoots(matches) // (from, to)
    val remapped = paperAuthors
      .join(broadcast(roots), paperAuthors("authorID") === roots("from"), "left")
      .select(col("paperID"), coalesce(col("to"), col("authorID")).as("authorID"))
      .distinct()

    val withCites = remapped
      .join(papers.select(col("paperID"), col("citationCount")), Seq("paperID"), "left")
      .na.fill(0, Seq("citationCount"))
    // ONE aggregation for all three stats (r07): PaperCount, CitationCount
    // and hIndex share the groupBy(authorID) exchange; the h-index is the
    // codegen'd sorted-prefix count over the group's citation list
    // (HIndex.hIndexOfList) — the previous shape paid a window sort plus
    // a second aggregate plus a stats⋈h join for the same result. Every
    // author has >= 1 paper, so the old left-join + fill(0) path could
    // never fire — dropping it is value-identical.
    val stats = withCites
      .groupBy(col("authorID"))
      .agg(
        count(lit(1)).as("PaperCount"),
        sum(col("citationCount")).as("CitationCount"),
        HIndex.hIndexOfList(collect_list(col("citationCount").cast("long"))).as("hIndex"))
    (remapped, stats)
  }
}
