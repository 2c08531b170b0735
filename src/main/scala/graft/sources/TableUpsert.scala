package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5 — keyed upsert ("MERGE") into a parquet table with an atomic
  * version swap: the engine analog of the reference's MySQL
  * `REPLACE INTO` upserts (update_links.py:84-90, the per-author row
  * replacement; extract_scigene_field.py's table reloads), re-expressed
  * for an object-store table layout where rows cannot be mutated in
  * place:
  *
  *   merged  = updates UNION (current ANTI-JOIN updates ON key)
  *   commit  = write merged under `<table>/v<N+1>/`, then atomically
  *             swap the `_current` pointer file to it
  *
  * Readers resolve through `_current`, so they see the previous
  * version until the instant the pointer moves — key-wise
  * last-writer-wins with all-or-nothing visibility, which is exactly
  * the observable contract of the reference's transactional REPLACE. A
  * crashed writer leaves a dangling `v<N+1>` directory and an untouched
  * pointer: the table is unchanged (same commit protocol as
  * graph.Supersteps; this is also precisely the seam where an Iceberg
  * `MERGE INTO` drops in when its runtime jar is on the classpath).
  *
  * Scale: one shuffle (the anti join on the key); the update side is
  * broadcast when small. No driver-side row handling. Each commit
  * rewrites the table's data files — correct at any size, but at
  * 100 TB the table should be partitioned by a key prefix so only the
  * partitions the update batch touches are merged and re-pointed (or
  * the Iceberg MERGE INTO seam above takes over and rewrites per-file).
  */
object TableUpsert {

  private def fs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Currently committed version directory, if any. */
  def currentVersion(spark: SparkSession, tableDir: String): Option[String] = {
    val (f, p) = fs(spark, tableDir)
    val ptr = new org.apache.hadoop.fs.Path(p, "_current")
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  /** The committed table contents (empty relation with the updates'
    * schema if nothing is committed yet is not derivable — callers
    * should treat None as "table absent").
    */
  def read(spark: SparkSession, tableDir: String): Option[DataFrame] =
    currentVersion(spark, tableDir).map(v => spark.read.parquet(s"$tableDir/$v"))

  /** Upsert `updates` by `keyCols`: rows whose key exists in `updates`
    * are replaced, all other current rows are kept, new keys are
    * inserted. Returns the newly committed version's DataFrame. If
    * `updates` carries several rows per key they are all kept (mirror
    * the reference: REPLACE INTO with a multi-row VALUES keeps each
    * inserted row); dedupe upstream if last-one-wins within the batch is
    * wanted.
    */
  def upsert(spark: SparkSession, tableDir: String, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    val (f, root) = fs(spark, tableDir)
    f.mkdirs(root)
    val cur = currentVersion(spark, tableDir)
    val nextN = cur.map(_.stripPrefix("v").toLong + 1).getOrElse(1L)
    val nextDir = s"v$nextN"
    val merged = cur match {
      case None => updates
      case Some(v) =>
        val current = spark.read.parquet(s"$tableDir/$v")
        // column-pruned anti join; Catalyst broadcasts small update sides
        updates.unionByName(
          current.join(updates.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti"))
    }
    merged.write.mode("overwrite").parquet(s"$tableDir/$nextDir")
    // atomic pointer swap: write aside, then rename over (HDFS/posix
    // rename is atomic; object stores substitute a conditional put here)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_current.tmp$nextN")
    val out = f.create(tmp, true)
    try out.write(nextDir.getBytes("UTF-8")) finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(root, "_current")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      root.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    spark.read.parquet(s"$tableDir/$nextDir")
  }
}
