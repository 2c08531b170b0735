package graft.tools

import graft.analytics._
import graft.core.Sessions
import org.apache.spark.sql.functions._

/** Drives the analytics library surface end-to-end on real testdata
  * (sf0.001 TPC-H-ish tables) — runtime observation, not unit tests.
  */
object AnalyticsDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, "graft-analytics-demo")
    import spark.implicits._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    println("== topK with ties: customers by total spend (k=5) ==")
    val spend = orders.groupBy("o_custkey").agg(sum("o_totalprice").as("spend"))
    val top = TopK.withTies(spend, "spend", 5)
    println(s"rows kept=${top.count()} (>= 5)")
    top.orderBy(desc("spend")).show(7)

    println("== h-index: per customer over order line counts ==")
    val cites = lineitem.groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")), "l_orderkey")
    val h = HIndex.perGroup(cites, "o_custkey", "c")
    h.orderBy(desc("h_index")).show(5)

    println("== common neighbors: parts sharing orders ==")
    val adj = lineitem.select(col("l_partkey").as("node"), col("l_orderkey").as("nbr"))
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    CommonNeighbors.metrics(adj, pairs).show()

    println("== gap-filled series: per-customer order years ==")
    val yrs = orders.select(col("o_custkey").as("paperID"), year(col("o_orderdate")).as("year"))
    val series = TimeSeries.gapFilledSeries(yrs)
    series.orderBy("paperID").show(3, 80)

    println("== edge features over a synthetic citation pair ==")
    val s = Seq(
      (1L, 2000, 2008, 30, Seq(2, 3, 4, 5, 6, 4, 3, 2, 1)),
      (2L, 2001, 2008, 28, Seq(3, 4, 5, 6, 4, 3, 2, 1))
    ).toDF("paperID", "citeStartYear", "citeEndYear", "totalCitationCount", "citationCountByYear")
    TimeSeries.edgeFeatures(Seq((1L, 2L)).toDF("citing", "cited"), s).show(false)

    println("== name match over customer names with planted dupes ==")
    val names = customer.select(col("c_custkey").as("id"), col("c_name").as("name"))
      .union(Seq((99901L, "Customer#000000001"), (99902L, "Custömer#000000002")).toDF("id", "name"))
    val matches = NameMatch.matchPairs(names)
    println(s"match pairs found=${matches.count()}")
    matches.show(5, false)

    println("== distribution stats on lineitem discount ==")
    println(Distribution.stats(lineitem, "l_discount"))

    println("== isKeyPaper over a mini citation fixture ==")
    val papers = Seq((101L, "t1", 2000), (102L, "t2", 2001), (103L, "t3", 2002)).toDF("paperID", "title", "year")
    val pa = Seq((101L, 1L, 1), (102L, 2L, 1), (102L, 1L, 2), (103L, 1L, 2), (103L, 2L, 1))
      .toDF("paperID", "authorID", "authorOrder")
    KeyPapers.isKeyPaper(papers, pa, Seq(Tuple1(1L)).toDF("authorID")).show()

    spark.stop()
  }
}
