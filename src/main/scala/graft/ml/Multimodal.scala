package graft.ml

import java.awt.image.BufferedImage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fetch.ImageKit

/** Multimodal-column operators: media as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample stages.
  *
  * Image decode/resize is REAL (javax.imageio ships with the JDK). Audio
  * and video decoding have no codecs in this container, so those stages are
  * deterministic STUBS — the Spark-side plumbing (schemas, batch shape,
  * partition behavior) is real and tested; swap the stub body for an FFI
  * decode call on a cluster with codecs installed.
  */
object Multimodal {

  /** Magic-byte format sniff. */
  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) return "unknown"
    if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') "png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F') "riff"
    else "unknown"
  }

  final case class ImageMeta(w: Int, h: Int, fmt: String, phash: Long)

  /** Real image decode → metadata + perceptual hash. */
  def imageMeta(bytes: Array[Byte]): Option[ImageMeta] = {
    try {
      val img = ImageKit.decode(bytes)
      if (img == null) None
      else Some(ImageMeta(img.getWidth, img.getHeight, sniffFormat(bytes),
        ImageKit.phash(img)))
    } catch { case _: Exception => None }
  }

  val imageMetaUdf = udf((bytes: Array[Byte]) => imageMeta(bytes))

  /** Real image resize (bilinear) → re-encoded PNG bytes. */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    try {
      val img = ImageKit.decode(bytes)
      if (img == null) return None
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      Some(ImageKit.encode(out, "png"))
    } catch { case _: Exception => None }
  }

  val resizeUdf = udf((bytes: Array[Byte], w: Int, h: Int) =>
    resizeImage(bytes, w, h))

  /** STUB — audio feature extraction. No audio codecs in this container:
    * returns a deterministic 8-dim pseudo-feature from the byte content so
    * the pipeline shape (binary → fixed-dim float vector) is exercised
    * end-to-end. Replace the body with a real decoder on a full cluster. */
  def audioFeaturesStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0.0f)
    val out = new Array[Float](8)
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) { h = ImageKit.mix(h ^ bytes(i)); i += 1 }
    var d = 0
    while (d < 8) {
      out(d) = (((h >> (d * 8)) & 0xff).toFloat / 255.0f) - 0.5f
      d += 1
    }
    out
  }

  val audioFeaturesUdf = udf((bytes: Array[Byte]) => audioFeaturesStub(bytes))

  /** STUB — video frame sampling. No video codecs: emits `n` synthetic
    * frame records (frame index + deterministic pseudo-frame-hash) with the
    * real one-row→N-rows explode shape a frame sampler produces. */
  def sampleFramesStub(bytes: Array[Byte], n: Int): Seq[(Int, Long)] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    var h = 0xbf58476d1ce4e5b9L
    var i = 0
    while (i < math.min(bytes.length, 4096)) { h = ImageKit.mix(h ^ bytes(i)); i += 1 }
    (0 until n).map(f => (f, ImageKit.mix(h + f)))
  }

  val sampleFramesUdf = udf((bytes: Array[Byte], n: Int) =>
    sampleFramesStub(bytes, n))

  /** Full image-corpus metadata pipeline: binary column in, typed metadata
    * out, nulls for undecodable rows kept for auditability. */
  def describeImages(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("meta", imageMetaUdf(col(bytesCol)))
      .withColumn("decoded_w", col("meta.w"))
      .withColumn("decoded_h", col("meta.h"))
      .withColumn("decoded_fmt", col("meta.fmt"))
      .withColumn("decoded_phash", col("meta.phash"))
      .drop("meta")
}
