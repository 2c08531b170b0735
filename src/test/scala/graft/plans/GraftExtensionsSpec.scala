package graft.plans

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  test("RewriteHofDot: the declarative HOF dot idiom becomes the native vec_dot expression") {
    // parquet-backed: a local Seq is eagerly evaluated by
    // ConvertToLocalRelation, which erases the projection before the
    // plan string can be inspected
    val dir = java.nio.file.Files.createTempDirectory("hof_dot").toString
    Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.5), Seq(2.0, 2.0))
    ).toDF("a", "b").coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).orderBy(size(col("a")).desc)
    val q = df.select(hofDot.as("dot"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      s"not rewritten:\n${q.queryExecution.optimizedPlan}")
    // value identity with both the native API and the in-test fold
    val native = df.select(VectorOps.dot(col("a"), col("b")).as("dot")).as[Double].collect()
    assert(q.as[Double].collect().toSeq == native.toSeq)
    assert(native.toSeq == Seq(((0.0 + 4.0) + 10.0) + 18.0, (0.0 + 1.0) + -3.0))
  }

  test("RewriteHofDot: non-matching shapes are left alone") {
    // parquet-backed for the same ConvertToLocalRelation reason: a plan
    // that got eagerly evaluated would pass the no-vec_dot check vacuously
    val dir = java.nio.file.Files.createTempDirectory("hof_neg").toString
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val dirF = java.nio.file.Files.createTempDirectory("hof_negf").toString
    Seq((Seq(1.0f), Seq(2.0f))).toDF("a", "b").write.mode("overwrite").parquet(dirF)
    val wrongMul = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y * 2.0), lit(0.0d), (acc, v) => acc + v).as("d"))
    val wrongZero = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(1.0d), (acc, v) => acc + v).as("d"))
    val floatArrays = spark.read.parquet(dirF).select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v).as("d"))
    Seq("wrongMul" -> wrongMul, "wrongZero" -> wrongZero, "floatArrays" -> floatArrays)
      .foreach { case (name, q) =>
        assert(!q.queryExecution.optimizedPlan.toString.contains("vec_dot"),
          s"$name was wrongly rewritten:\n${q.queryExecution.optimizedPlan}")
      }
    // the left-alone forms still evaluate correctly
    assert(wrongMul.as[Double].head() == (3.0 * 2.0 + 8.0 * 2.0))
    assert(wrongZero.as[Double].head() == 1.0 + 3.0 + 8.0)
  }

  test("RewriteHofDot: null element and length mismatch stay null (same as the HOF form)") {
    val df = Seq((Seq(Option(1.0), None), Seq(Option(2.0), Option(3.0)))).toDF("a", "b")
    val viaRule = df.select(hofDot.as("dot")).collect()
    assert(viaRule.head.isNullAt(0))
    val mism = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(hofDot.as("dot")).collect()
    assert(mism.head.isNullAt(0))
  }
}
