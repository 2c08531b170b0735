package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-author graph export — the engine analog of analysis/main.py:75-101
  * and vis/process.py: for each author, the induced citation subgraph as
  * one JSON document {nodes: {paperID: isKeyPaper}, edges: [{source,
  * target, prob}]}, plus a probability-thresholded variant (vis/process.py
  * keeps edges with extendsProb above a cutoff before layout).
  *
  * Scale: one groupBy(authorID) shuffle; JSON assembly is Catalyst
  * to_json over collected per-author structs (bounded by one author's
  * paper count, as in the reference's per-author CSV files).
  */
object GraphExport {

  /** @param links  (authorID, childrenID, parentID, extendsProb) — the
    *               update_links output
    * @param papers (authorID, paperID, isKeyPaper)
    * @param minProb edges below this are dropped (vis threshold; 0.0 keeps all)
    */
  def perAuthorJson(links: DataFrame, papers: DataFrame, minProb: Double = 0.0): DataFrame = {
    val edges = links
      .filter(col("extendsProb") >= minProb)
      .groupBy(col("authorID"))
      .agg(to_json(array_sort(collect_list(struct(
        col("childrenID").as("source"),
        col("parentID").as("target"),
        col("extendsProb").as("prob"))))).as("edges"))
    val nodes = papers
      .groupBy(col("authorID"))
      .agg(to_json(map_from_entries(array_sort(collect_list(struct(
        col("paperID"), col("isKeyPaper")))))).as("nodes"))
    nodes.join(edges, Seq("authorID"), "left")
      .select(col("authorID"),
        concat(lit("{\"nodes\":"), col("nodes"),
          lit(",\"edges\":"), coalesce(col("edges"), lit("[]")), lit("}")).as("graph_json"))
  }
}
