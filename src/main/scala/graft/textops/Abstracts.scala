package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X12 — abstract ingestion cleanup, the engine analog of the reference's
  * abstract import + dedup-merge stages:
  *
  *  - prefix strip (utils/import_abstract.py:54-57): an abstract whose
  *    first 8 chars are "Abstract"/"ABSTRACT"/"abstract" loses the prefix
  *    and is trimmed; empty abstracts are dropped (:52-53);
  *  - per-paper dedup-merge (utils/clean_abstract_table.py:36-38): all
  *    abstracts of a paper are de-duplicated and '\n'-joined. The
  *    reference joins a Python set (nondeterministic order); the engine
  *    sorts before joining so the merged text is deterministic at any
  *    parallelism.
  *
  * Scale: prefix strip is a codegen'd projection; the merge is one
  * groupBy(paperID) shuffle with map-side partial aggregation.
  */
object Abstracts {

  /** Strip the leading "Abstract"/"ABSTRACT"/"abstract" marker. */
  def stripPrefix(abstractCol: Column): Column =
    when(substring(abstractCol, 1, 8).isin("Abstract", "ABSTRACT", "abstract"),
      trim(abstractCol.substr(lit(9), length(abstractCol))))
      .otherwise(abstractCol)

  /** (paperID, abstract) -> cleaned rows: empties dropped, prefix stripped. */
  def cleaned(abstracts: DataFrame,
              idCol: String = "paperID", textCol: String = "abstract"): DataFrame =
    abstracts
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), stripPrefix(col(textCol)).as(textCol))

  /** Dedup-merge: one row per paper, distinct abstracts '\n'-joined in
    * sorted order.
    */
  def mergedPerPaper(abstracts: DataFrame,
                     idCol: String = "paperID", textCol: String = "abstract"): DataFrame =
    cleaned(abstracts, idCol, textCol)
      .groupBy(col(idCol))
      .agg(array_join(array_sort(collect_set(col(textCol))), "\n").as(textCol))
}
