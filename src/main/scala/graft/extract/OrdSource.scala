package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S2 — distributed ORD protobuf scan (SURVEY.md §2.1).
  *
  * Reference shape: joblib process-per-file loop over `.pb.gz` files
  * (extract/main.py:613-623, extractor.py:103-110). Spark shape: the
  * built-in `binaryFile` source lists and distributes the files (one task
  * per file — same parallel grain as the reference, but cluster-wide and
  * with locality), then each task gunzips + wire-decodes its datasets and
  * flat-maps reactions. Filename filtering (S2: substring / inverse
  * substring, skip-known-duplicate) happens on the file listing via
  * `pathGlobFilter` / a path filter BEFORE any bytes are read.
  */
object OrdSource {

  final case class OrdFileReaction(
      fileName: String, rxnOrdinal: Int, r: OrdWire.OrdReaction)

  /** Read every `*.pb.gz` under `dir` (2-level glob like the reference's
    * directory layout) into one reaction per row. */
  def readReactions(spark: SparkSession, dir: String,
      contains: Option[String] = None,
      inverseContains: Option[String] = None): Dataset[OrdFileReaction] = {
    implicit val enc = Encoders.product[OrdFileReaction]
    var files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pb.gz")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("content"))
    contains.foreach(s => files = files.filter(col("path").contains(s)))
    inverseContains.foreach(s => files = files.filter(!col("path").contains(s)))
    files.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY)).flatMap {
      case (path, bytes) =>
        val name = path.split('/').last.stripSuffix(".pb.gz")
        OrdWire.decodeDataset(OrdWire.gunzip(bytes)).zipWithIndex.map {
          case (r, i) => OrdFileReaction(name, i, r)
        }
    }
  }

  /** The nested DataFrame view (FIXTURES.md §1 Spark ingest type). */
  def readNested(spark: SparkSession, dir: String): DataFrame =
    readReactions(spark, dir).toDF()
      .select(col("fileName"), col("rxnOrdinal"), col("r.*"))
}
