package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Image decode is REAL — [[ImageCodec]] reads JPEG/PNG/GIF/BMP through the
  * JDK's `javax.imageio` (no new dependency), and dimension extraction is a
  * header-only read (no raster materialized). Audio/video frame decode
  * remains STUBBED behind the length-derived [[FakeCodec]] (those libs are
  * not in this container). Everything Spark-side is designed for scale:
  * binary columns stay opaque (never stringified), metadata is a narrow
  * struct computed in one pass, batch decode runs via `mapPartitions` (the
  * JVM analogue of `mapInPandas`: per-partition batch iteration amortizing
  * codec setup), and frame sampling produces bounded arrays, never
  * exploding frames unless asked.
  */
object Multimodal {

  /** Real image codec over the JDK's ImageIO. `setUseCache(false)` keeps
    * ImageIO off temp files — decodes stay in memory, which is what you
    * want in an executor processing millions of images. */
  object ImageCodec {
    ImageIO.setUseCache(false)

    /** (width, height) from the image header — the ImageReader is asked for
      * getWidth/getHeight WITHOUT decoding the raster, so a metadata scan
      * over 100 TB of images never materializes pixels. None when the
      * payload is not a recognized image format. */
    def dimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            Some((r.getWidth(0), r.getHeight(0)))
          } catch { case _: java.io.IOException => None }
          finally r.dispose()
        }
      } finally iis.close()
    }

    /** Full decode (raster materialized); None when undecodable. */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      Option(ImageIO.read(new ByteArrayInputStream(bytes)))

    /** Deterministic single-color PNG: a REAL, decodable payload for tests
      * and pipelines that need image bytes without a media corpus. */
    def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val rgb = ((seed * 0x9E3779B97F4A7C15L) >>> 40).toInt & 0xffffff
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, width, height) }
      finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  private val synthPngU =
    udf((w: Int, h: Int, seed: Long) => ImageCodec.synthPng(w, h, seed))
  /** Column wrapper over [[ImageCodec.synthPng]]. */
  def synthPng(width: Column, height: Column, seed: Column): Column =
    synthPngU(width, height, seed)

  private val imageDimsU = udf((b: Array[Byte]) => ImageCodec.dimensions(b))
  /** Real header-only decode as a Column: struct(_1 = width, _2 = height),
    * null for non-image payloads. */
  def imageDims(payload: Column): Column = imageDimsU(payload)

  /** Deterministic length-derived metadata: the STUB half (audio/video
    * frame counts) and the fallback for non-image payloads. */
  object FakeCodec {
    def width(payload: Column): Column = (length(payload) % 512 + 64).cast("int")
    def height(payload: Column): Column = (length(payload) % 384 + 48).cast("int")
    def channels: Column = lit(3)
    /** One "frame" per 100 payload bytes, at least 1. */
    def nFrames(payload: Column): Column =
      greatest(floor(length(payload) / 100), lit(1)).cast("int")
  }

  /** Attach an image/video metadata struct to a binary payload column —
    * the cheap expression-only pass (length-derived, oracle-expressible).
    * For real image dimensions use [[imageDims]]/[[batchDecode]]. */
  def withMediaMeta(df: DataFrame, payload: String): DataFrame =
    df.withColumn("media_meta", struct(
      FakeCodec.width(col(payload)).as("width"),
      FakeCodec.height(col(payload)).as("height"),
      FakeCodec.channels.as("channels"),
      FakeCodec.nFrames(col(payload)).as("n_frames"),
      length(col(payload)).cast("long").as("n_bytes")))

  /** Frame-sample indices: every `stride`-th frame, 0-based, bounded. */
  def sampleFrameIdx(nFrames: Column, stride: Int): Column =
    sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))

  /** "Resize": deterministic target dims preserving aspect bucket. STUB. */
  def resizeMeta(w: Column, h: Column, target: Int): Column =
    struct(lit(target).as("width"),
      greatest((h * target / greatest(w, lit(1))).cast("int"), lit(1)).as("height"))

  /** Batch decode via mapPartitions — the JVM analogue of a Pandas UDF over
    * mapInPandas: rows stream per partition, codec state amortizes across
    * the batch. Image payloads get REAL header-decoded dimensions; payloads
    * ImageIO does not recognize fall back to the deterministic length
    * stand-in (documented stub semantics, keeps non-image corpora flowing).
    * The feature is an FNV-1a digest of the payload — deterministic, cheap.
    */
  case class DecodedMeta(id: Long, width: Int, height: Int, feature: Long)

  def batchDecode(df: DataFrame, idCol: String, payloadCol: String): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    df.select(col(idCol).cast("long"), col(payloadCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // null payload = empty payload: one null row must not kill the scan
        val raw = r.getAs[Array[Byte]](1)
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val (w, h) = ImageCodec.dimensions(bytes).getOrElse(
          (bytes.length % 512 + 64, bytes.length % 384 + 48))
        var f = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) { f = (f ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
        DecodedMeta(id, w, h, f)
      }
    }
  }
}
