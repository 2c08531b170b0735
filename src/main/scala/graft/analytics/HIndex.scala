package graft.analytics

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

/** h-index with the reference's exact cutoff semantics: sort citations
  * descending, h = #{ i (0-based) : citations_i > i }
  * (create_field/extract_abstract.py:54-60; recomputed the same way at
  * update_papers.py:163-167 and merge_author.py:55-58).
  *
  * Two formulations:
  *  - `perGroup`: window row_number + conditional count — fully
  *    distributed, partitioned by the group key (the scale path);
  *  - `HIndexAggregator`: a typed `Aggregator[Int, Array, Int]` for use in
  *    `groupByKey.agg` where a single-pass typed aggregation is preferred.
  */
object HIndex {

  /** (groupCol, citationCol) -> (groupCol, h_index). `citation > i`
    * 0-based == `citation >= row_number` 1-based.
    */
  def perGroup(df: DataFrame, groupCol: String, citationCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__c").desc)
    df.select(col(groupCol), col(citationCol).cast("long").as("__c"))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(sum(when(col("__c") >= col("__rn"), 1L).otherwise(0L)).as("h_index"))
  }

  /** Typed single-pass aggregator. Buffer keeps all citation counts; the
    * merge is associative/commutative; finish sorts once. Exact — not a
    * sketch. Suitable when per-group cardinality is bounded (papers per
    * author); for unbounded groups prefer `perGroup`.
    */
  class HIndexAggregator extends Aggregator[Long, Seq[Long], Int] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], a: Long): Seq[Long] = b :+ a
    def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = b1 ++ b2
    def finish(b: Seq[Long]): Int = compute(b)
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** Plain-Scala core, shared by the aggregator and tests. */
  def compute(citations: Seq[Long]): Int =
    citations.sortBy(-_).zipWithIndex.count { case (c, i) => c > i }
}
