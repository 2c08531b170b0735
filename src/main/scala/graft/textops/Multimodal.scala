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
  * Scala analog of `mapInPandas` batches). IMAGES decode for real through
  * the JDK's pure-Java ImageIO readers (PNG/BMP/GIF/WBMP — `decode`,
  * `resizeImage`): width/height from actual pixels, content feature from
  * the luminance raster. Audio/video decode is STUBBED: no audio/video
  * codecs ship in this container, so `decodeStub` produces a
  * deterministic fake (duration derived from the bytes) with the exact
  * signature a real decoder would have — swapping in a codec is a
  * one-function change.
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

  // ImageIO's default disk cache would create a temp file per decode on
  // every executor — pure memory streams instead.
  private lazy val imageIoReady: Boolean = {
    javax.imageio.ImageIO.setUseCache(false)
    true
  }

  /** Deterministic test PNG: a w x h RGB image painted in the SAME 4x2
    * grid `decode` samples, each cell a constant color derived from
    * (id, cell) by pure integer math — so the decoded luminance features
    * are an exact closed-form function of (id, w, h) that a SQL oracle
    * can recompute without touching PNG bytes (PNG is lossless for RGB;
    * the byte stream itself is encoder-dependent and deliberately NOT
    * part of the contract). Drives the driver-checked q_media_features.
    * Use w divisible by 4 and h by 2 so painted cells align exactly with
    * decode's grid.
    */
  def syntheticCellPng(id: Long, w: Int, h: Int): Array[Byte] = {
    imageIoReady
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = (y * 2 / h) * 4 + (x * 4 / w)
        val r = ((id * 31 + cell * 97) % 256).toInt
        val g = ((id * 57 + cell * 13) % 256).toInt
        val b = ((id * 89 + cell * 41) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode via the JDK's pure-Java ImageIO readers (PNG, BMP,
    * GIF, WBMP — no native codecs needed, so this works in any JVM
    * container). Width/height come from the actual pixel raster, and the
    * 8-dim content feature is the mean luminance of a 4x2 grid over the
    * image (strided sampling caps per-image work for huge rasters —
    * deterministic regardless of partitioning). Audio/video and
    * non-decodable image bytes fall back to `decodeStub`: the container
    * ships no audio/video codecs (the declared seam), and a poison blob
    * must never fail the batch.
    */
  def decode(row: MediaRow): MediaFeatures = {
    if (row.kind != "image") decodeStub(row)
    else {
      val img =
        try {
          imageIoReady
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.media)))
        } catch { case _: Throwable => None }
      img match {
        case None => decodeStub(row)
        case Some(bi) =>
          val w = bi.getWidth
          val h = bi.getHeight
          val feat = new Array[Float](8)
          val strideX = math.max(1, w / 64)
          val strideY = math.max(1, h / 64)
          var gy = 0
          while (gy < 2) {
            var gx = 0
            while (gx < 4) {
              val x0 = gx * w / 4; val x1 = math.max(x0 + 1, (gx + 1) * w / 4)
              val y0 = gy * h / 2; val y1 = math.max(y0 + 1, (gy + 1) * h / 2)
              var sum = 0.0; var cnt = 0
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = bi.getRGB(x, y)
                  // ITU-R BT.601 luma from the sRGB channels
                  sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  cnt += 1
                  x += strideX
                }
                y += strideY
              }
              feat(gy * 4 + gx) = (sum / (cnt * 255.0)).toFloat
              gx += 1
            }
            gy += 1
          }
          decodeStub(row).copy(width = w, height = h, feature = feat)
      }
    }
  }

  /** Feature extraction over size-balanced partitions: repartition by a
    * range on byte size so decode batches are even (a 100 MB video and a
    * 10 KB thumbnail shouldn't share a task queue position), then decode
    * per partition with the typed API — the Scala analog of mapInPandas
    * batches. Images decode for real (see `decode`); audio/video stay on
    * the stub seam.
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
      .mapPartitions(_.map(decode))
  }

  /** Image resize via the JDK raster pipeline (bilinear) — returns PNG
    * bytes; the Spark-side shape is the same one-row-in/one-row-out batch
    * map as `decode`. Non-decodable input returns the original bytes
    * unchanged (poison-safe).
    */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
    val img =
      try {
        imageIoReady
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      } catch { case _: Throwable => None }
    img match {
      case None => bytes
      case Some(bi) =>
        val scale = maxDim.toDouble / math.max(bi.getWidth, bi.getHeight)
        if (scale >= 1.0) bytes
        else {
          val nw = math.max(1, math.round(bi.getWidth * scale).toInt)
          val nh = math.max(1, math.round(bi.getHeight * scale).toInt)
          // preserve the alpha channel when the source has one — drawing
          // onto an RGB canvas would composite transparency to black
          val outType =
            if (bi.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
          val out = new java.awt.image.BufferedImage(nw, nh, outType)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(bi, 0, 0, nw, nh, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
    }
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
