package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side design is real and tested — schema, partitioning by
  * media size (so one partition never holds too many decoded frames),
  * batch-shaped per-partition processing via the typed Dataset API (the
  * Scala analog of `mapInPandas` batches). The decode itself is STUBBED:
  * no image/audio codecs ship in this container, so `decodeStub` produces
  * a deterministic fake (dimensions/duration derived from the bytes) with
  * the exact signature a real decoder would have. Swapping in a codec is
  * a one-function change.
  */
object Multimodal {

  /** Canonical media row. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      media: Array[Byte],
      source: String
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha: String,
      width: Int, // images/video; -1 otherwise
      height: Int,
      duration_ms: Long, // audio/video; -1 otherwise
      feature: Array[Float] // fixed 8-dim content feature
  )

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("source", StringType, nullable = true)
  ))

  /** Deterministic synthetic media table (for tests/bench): payload bytes
    * are a seeded function of the id; kinds round-robin.
    */
  def synthetic(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    spark.range(0, n).select(
      col("id").as("media_id"),
      element_at(kinds, (pmod(col("id"), lit(3L)) + 1).cast("int")).as("kind"),
      // payload: sha256 hex of (id, seed) repeated ~(1 + id%7) times
      repeat(sha2(concat(col("id").cast("string"), lit(seed.toString)), 256),
        (pmod(col("id"), lit(7L)) + 1).cast("int")).cast("binary").as("media"),
      concat(lit("synth://"), col("id")).as("source")
    )
  }

  /** STUB decoder — deterministic fake with a real decoder's signature.
    * A production build replaces the body with an actual codec call; the
    * batch shape, schema and partitioning stay identical.
    */
  def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.media
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val sha = h.map("%02x".format(_)).mkString
    val b0 = java.lang.Byte.toUnsignedInt(h(0))
    val b1 = java.lang.Byte.toUnsignedInt(h(1))
    val isVisual = row.kind == "image" || row.kind == "video"
    val isTimed = row.kind == "audio" || row.kind == "video"
    MediaFeatures(
      media_id = row.media_id,
      kind = row.kind,
      n_bytes = bytes.length.toLong,
      sha = sha,
      width = if (isVisual) 16 * (b0 % 64 + 1) else -1,
      height = if (isVisual) 16 * (b1 % 64 + 1) else -1,
      duration_ms = if (isTimed) 1000L * (bytes.length % 300 + 1) else -1L,
      feature = Array.tabulate(8)(i => java.lang.Byte.toUnsignedInt(h(i)).toFloat / 255f)
    )
  }

  /** Feature extraction over size-balanced partitions: repartition by a
    * range on byte size so decode batches are even (a 100 MB video and a
    * 10 KB thumbnail shouldn't share a task queue position), then decode
    * per partition with the typed API — the Scala analog of mapInPandas
    * batches.
    */
  def extractFeatures(media: DataFrame, partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val P = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    media
      .withColumn("__sz", length(col("media")))
      .repartitionByRange(P, col("__sz"), col("media_id"))
      .drop("__sz")
      .as[MediaRow]
      .mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling plan for videos: every `everyMs` ms up to `maxFrames`
    * timestamps — pure column math (the decode of each frame is the same
    * stub seam).
    */
  def frameSamplePlan(features: DataFrame, everyMs: Long = 1000L, maxFrames: Int = 16): DataFrame =
    features
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        explode(sequence(lit(0L),
          least(col("duration_ms"), lit(everyMs * (maxFrames - 1))), lit(everyMs))).as("frame_ts_ms")
      )
}
