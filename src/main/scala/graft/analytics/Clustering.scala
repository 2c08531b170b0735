package graft.analytics

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** M4 — seeded KMeans over 2-d topic coordinates
  * (topic/cluster_topic.py:16-25): assigns each (x, y) row a cluster
  * label; deterministic via fixed seed. Wraps MLlib's KMeans (on the
  * classpath with the Spark distribution).
  *
  * M3's topic/label assignment itself is served by the engine's Label
  * Propagation (graph.LabelPropagation); this roll-up groups label
  * centroids into root clusters like group_to_root.py:11-23.
  */
object Clustering {

  /** df(id, x, y) -> df(id, x, y, cluster). */
  def kmeansXY(df: DataFrame, k: Int, seed: Long = 42L, maxIter: Int = 50): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val assembler = udf((x: Double, y: Double) => Vectors.dense(x, y))
    val feats = df.withColumn("features", assembler(col("x").cast("double"), col("y").cast("double")))
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter).fit(feats)
    model.transform(feats)
      .withColumnRenamed("prediction", "cluster")
      .drop("features")
  }

  /** Per-cluster roll-up: member count and summed weight
    * (group_to_root.py:15-21).
    */
  def rollUp(clustered: DataFrame, weightCol: String): DataFrame =
    clustered.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col(weightCol)).as("total"))
}
