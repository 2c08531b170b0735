package graft.sources

import graft.SparkSpec
import graft.analytics.Clustering
import graft.functions.ColorFunctions
import org.apache.spark.sql.functions._

class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  test("S7: embedded JSON inverted index parses to map<string,array<int>>") {
    val df = Seq((1L, """{"deep":[1],"learning":[2],"of":[3,5],"graphs":[4]}"""))
      .toDF("id", "ii")
    val parsed = df.select(col("id"), SemiStructured.parseInvertedIndex(col("ii")).as("m"))
    val m = parsed.select("m").first().getMap[String, scala.collection.Seq[Int]](0)
    assert(m("of").toSeq == Seq(3, 5))
  }

  test("X11: inverted index -> ordered text") {
    val df = Seq((1L, """{"world":[1],"hello":[0],"again":[2,3]}"""))
      .toDF("id", "ii")
    val txt = df.select(
      SemiStructured.invertedIndexToText(SemiStructured.parseInvertedIndex(col("ii"))).as("t")
    ).first().getString(0)
    assert(txt == "hello world again again")
  }

  test("S8: N-Triples multi-line literal merge + parse") {
    val lines = Seq(
      "<http://ex/p1> <http://ex/title> \"An abstract",
      "that spans lines\" .",
      "<http://ex/p1> <http://ex/cites> <http://ex/p2> .",
      "<http://ex/p2> <http://ex/title> \"Short\"@en ."
    ).toDS()
    val merged = SemiStructured.mergeTripleLines(lines.coalesce(1))
    assert(merged.count() == 3)
    val triples = SemiStructured.parseTriples(merged).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(triples.contains(("http://ex/p1", "http://ex/cites", "http://ex/p2")))
    assert(triples.contains(("http://ex/p1", "http://ex/title", "An abstract\nthat spans lines")))
    assert(triples.contains(("http://ex/p2", "http://ex/title", "Short")))
  }

  test("X10: HSV -> RGB hex matches known anchors") {
    assert(ColorFunctions.hsvToHex(0, 1, 1) == "#ff0000")
    assert(ColorFunctions.hsvToHex(120, 1, 1) == "#00ff00")
    assert(ColorFunctions.hsvToHex(240, 1, 1) == "#0000ff")
    assert(ColorFunctions.hsvToHex(0, 0, 1) == "#ffffff")
    assert(ColorFunctions.hsvToHex(0, 0, 0) == "#000000")
    assert(ColorFunctions.hsvToHex(60, 1, 1) == "#ffff00")
  }

  test("M4: deterministic Lloyd separates blobs, bit-stable across partitionings") {
    // two integer-coordinate blobs; lloydXY must separate them and give
    // the IDENTICAL assignment at any input partitioning (exact BIGINT
    // centroid sums -> no float-order dependence)
    val pts = (0 until 40).map(i => (i.toLong, (i % 5).toDouble, (i % 7).toDouble)) ++
      (40 until 80).map(i => (i.toLong, (50 + i % 5).toDouble, (50 + i % 7).toDouble))
    val df8 = pts.toDF("id", "x", "y").repartition(8)
    val df3 = pts.toDF("id", "x", "y").repartition(3)
    val a = Clustering.lloydXY(df8, k = 2, iters = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("cluster")).toMap
    val b = Clustering.lloydXY(df3, k = 2, iters = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("cluster")).toMap
    assert(a == b, "assignment must not depend on partitioning")
    assert((0 until 40).map(i => a(i.toLong)).distinct.size == 1, "blob 1 is one cluster")
    assert((40 until 80).map(i => a(i.toLong)).distinct.size == 1, "blob 2 is one cluster")
    assert(a(0L) != a(40L), "blobs are separated")
  }

  test("M4: seeded KMeans separates two obvious blobs deterministically") {
    val pts = (0 until 50).map(i => (i.toLong, 0.0 + i % 5 * 0.01, 0.0 + i % 7 * 0.01)) ++
      (50 until 100).map(i => (i.toLong, 10.0 + i % 5 * 0.01, 10.0 + i % 7 * 0.01))
    val df = pts.toDF("id", "x", "y")
    val out = Clustering.kmeansXY(df, k = 2).cache()
    val byBlob = out.withColumn("blob", when(col("id") < 50, 0).otherwise(1))
      .groupBy("blob").agg(countDistinct("cluster").as("nc")).collect()
    assert(byBlob.forall(_.getLong(1) == 1), "each blob maps to exactly one cluster")
    val again = Clustering.kmeansXY(df, k = 2).collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cluster")).toMap
    val first = out.collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("cluster")).toMap
    assert(again == first, "seeded -> deterministic")
    val roll = Clustering.rollUp(out.withColumn("w", lit(2.0)), "w").collect()
    assert(roll.map(_.getLong(1)).sum == 100 && roll.map(_.getDouble(2)).sum == 200.0)
  }
}
