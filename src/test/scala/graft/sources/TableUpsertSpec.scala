package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S5 — keyed upsert + atomic commit semantics (the reference's
  * REPLACE INTO contract: update_links.py:84-90).
  */
class TableUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"

  test("insert, replace-by-key, keep-unmatched") {
    val dir = freshDir()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    TableUpsert.upsert(spark, dir, base, Seq("k"))
    val upd = Seq((2L, "B"), (4L, "d")).toDF("k", "v")
    TableUpsert.upsert(spark, dir, upd, Seq("k"))
    val got = TableUpsert.read(spark, dir).get.as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("versions advance and the pointer resolves the newest") {
    val dir = freshDir()
    TableUpsert.upsert(spark, dir, Seq((1L, 1)).toDF("k", "n"), Seq("k"))
    TableUpsert.upsert(spark, dir, Seq((1L, 2)).toDF("k", "n"), Seq("k"))
    assert(TableUpsert.currentVersion(spark, dir).contains("v2"))
    assert(TableUpsert.read(spark, dir).get.select("n").as[Int].collect().toSeq == Seq(2))
  }

  test("a crashed writer (orphan version dir, pointer untouched) leaves the table unchanged") {
    val dir = freshDir()
    TableUpsert.upsert(spark, dir, Seq((1L, "ok")).toDF("k", "v"), Seq("k"))
    // simulate: a v2 directory written but the commit pointer never moved
    Seq((1L, "torn")).toDF("k", "v").write.parquet(s"$dir/v2")
    assert(TableUpsert.currentVersion(spark, dir).contains("v1"))
    assert(TableUpsert.read(spark, dir).get.select("v").as[String].collect().toSeq == Seq("ok"))
    // the next successful upsert commits OVER the orphan's number space
    TableUpsert.upsert(spark, dir, Seq((2L, "x")).toDF("k", "v"), Seq("k"))
    val got = TableUpsert.read(spark, dir).get.as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "ok"), (2L, "x")))
  }

  test("absent table reads as None; first upsert creates v1") {
    val dir = freshDir()
    assert(TableUpsert.read(spark, dir).isEmpty)
    TableUpsert.upsert(spark, dir, Seq((9L, 9)).toDF("k", "n"), Seq("k"))
    assert(TableUpsert.currentVersion(spark, dir).contains("v1"))
  }
}
