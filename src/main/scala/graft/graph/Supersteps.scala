package graft.graph

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Checkpointed superstep manager — the engine's resumable-iteration seam.
  *
  * Reference precedent: every pipeline stage writes its output file and
  * later runs skip work whose output exists (create_field/graph.py:21,82,
  * 106,153; compute_key_papers.py:231-232). Generalized here: each
  * superstep k writes
  *
  *   {runDir}/step=k/state/      (parquet snapshot of iteration state)
  *   {runDir}/step=k/_METRICS.json  (iteration metrics + per-partition
  *                                   row counts and checksums = lineage)
  *   {runDir}/step=k/_COMMIT     (atomic commit marker, written last)
  *
  * A step without `_COMMIT` is invisible — `lastCommitted` skips it — so
  * a job killed mid-write resumes from the previous step and produces
  * results identical to an uninterrupted run (property-tested).
  *
  * Uses the Hadoop FileSystem API throughout so the same code runs on
  * HDFS/S3A on a real cluster; Iceberg snapshot commits are a drop-in
  * replacement for the marker file when the runtime jar is present.
  */
object Supersteps {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stepDir(runDir: String, step: Int) = new Path(runDir, f"step=$step%05d")

  /** Per-partition lineage: (partition -> (rows, checksum)) computed in a
    * single aggregation pass over the state. The checksum is an
    * order-insensitive XOR of per-row 64-bit hashes, so it is stable
    * under shuffle-order nondeterminism but catches any row-level drift.
    */
  def partitionLineage(df: DataFrame): Seq[(Int, Long, Long)] = {
    val cols = df.columns.map(col)
    df.select(spark_partition_id().as("pid"), xxhash64(cols.toIndexedSeq: _*).as("h"))
      .groupBy("pid")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(h)").as("checksum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toSeq
      .sortBy(_._1)
  }

  /** Write one superstep atomically. Returns the checkpointed state
    * re-read from disk (truncating the logical plan lineage).
    */
  def commit(
      spark: SparkSession,
      runDir: String,
      step: Int,
      state: DataFrame,
      metrics: Map[String, Double]
  ): DataFrame = {
    val dir = stepDir(runDir, step)
    val f = fs(spark, runDir)
    if (f.exists(dir)) f.delete(dir, true)
    state.write.mode("overwrite").parquet(new Path(dir, "state").toString)

    val reread = spark.read.parquet(new Path(dir, "state").toString)
    val lineage = partitionLineage(reread)
    val lineageJson = lineage
      .map { case (p, n, c) => s"""{"partition":$p,"rows":$n,"checksum":$c}""" }
      .mkString("[", ",", "]")
    val metricsJson =
      (metrics.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" } :+
        s""""step":$step""" :+ s""""lineage":$lineageJson""").mkString("{", ",", "}")

    val mOut = f.create(new Path(dir, "_METRICS.json"), true)
    mOut.write(metricsJson.getBytes(StandardCharsets.UTF_8))
    mOut.close()
    val cOut = f.create(new Path(dir, "_COMMIT"), true)
    cOut.write("ok".getBytes(StandardCharsets.UTF_8))
    cOut.close()
    reread
  }

  /** Highest committed step in runDir, if any. */
  def lastCommitted(spark: SparkSession, runDir: String): Option[Int] = {
    val f = fs(spark, runDir)
    val root = new Path(runDir)
    if (!f.exists(root)) return None
    val steps = f
      .listStatus(root)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("step=") => s.stripPrefix("step=").toInt }
      .filter(k => f.exists(new Path(stepDir(runDir, k), "_COMMIT")))
    if (steps.isEmpty) None else Some(steps.max)
  }

  def readState(spark: SparkSession, runDir: String, step: Int): DataFrame =
    spark.read.parquet(new Path(stepDir(runDir, step), "state").toString)

  def readMetrics(spark: SparkSession, runDir: String, step: Int): String = {
    val p = new Path(stepDir(runDir, step), "_METRICS.json")
    val in = fs(spark, runDir).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}
