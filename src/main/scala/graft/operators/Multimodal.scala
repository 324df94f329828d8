package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The actual codec work (JPEG/PNG/audio decode) is STUBBED — the image/
  * audio libraries are not in this container — behind [[FakeCodec]], a
  * deterministic pure function of the payload bytes. Everything Spark-side
  * is real and designed for scale: binary columns stay opaque (never
  * stringified), metadata is a narrow struct computed in one pass, batch
  * decode runs via `mapPartitions` (the JVM analogue of `mapInPandas`:
  * per-partition batch iteration so a real codec could amortize native
  * setup per batch, not per row), and frame sampling produces bounded
  * arrays, never exploding frames unless asked.
  */
object Multimodal {

  /** Deterministic fake decode: "dimensions" derived from payload length
    * and first bytes. STUB — replace with a real codec binding. */
  object FakeCodec {
    def width(payload: Column): Column = (length(payload) % 512 + 64).cast("int")
    def height(payload: Column): Column = (length(payload) % 384 + 48).cast("int")
    def channels: Column = lit(3)
    /** One "frame" per 100 payload bytes, at least 1. */
    def nFrames(payload: Column): Column =
      greatest(floor(length(payload) / 100), lit(1)).cast("int")
  }

  /** Attach an image/video metadata struct to a binary payload column. */
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
    * mapInPandas: rows stream per partition, a real codec would init once
    * per partition and process in batches. Output schema (id, width,
    * height, feature) with the feature a stub digest of the payload.
    */
  case class DecodedMeta(id: Long, width: Int, height: Int, feature: Long)

  def batchDecode(df: DataFrame, idCol: String, payloadCol: String): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    df.select(col(idCol).cast("long"), col(payloadCol)).mapPartitions { rows =>
      // per-partition init (a real codec would open native handles here)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val w = bytes.length % 512 + 64
        val h = bytes.length % 384 + 48
        // stub feature: FNV-1a over the payload — deterministic, cheap
        var f = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) { f = (f ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
        DecodedMeta(id, w, h, f)
      }
    }
  }
}
