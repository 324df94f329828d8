package graft

import org.apache.spark.sql.functions._

import graft.extract._

/** trust_labelling=true extract flavour vs the reference's trust golden
  * corpus (84-col layout with separate catalyst/reagent columns). */
class TrustLabellingSpec extends SparkSpec {
  import spark.implicits._

  private val ordDir = "/root/reference/orderly/data/test_data/ord_test_data"
  private val goldenDir =
    "/root/reference/orderly/data/test_data/extracted_ord_test_data_trust_labelling/extracted_ords"

  private lazy val extracted = Extract.extractReactions(
    OrdSource.readNested(spark, ordDir), ExtractConfig(trustLabelling = true),
    IdentityChemistry, solventSet = Seq("O", "CO", "CCO")).cache()

  test("trust extract keeps every reaction and the labelled role split") {
    val golden = spark.read.parquet(goldenDir + "/*.parquet")
    assert(extracted.count() == golden.count(),
      s"ours=${extracted.count()} golden=${golden.count()}")
    assert(extracted.columns.contains("reagents")
      && extracted.columns.contains("catalysts"))
    // agents stay empty in trust mode (no merge-to-agents)
    assert(extracted.filter(size(col("agents")) > 0).count() == 0)
    // some reactions do carry catalysts/reagents
    assert(extracted.filter(size(col("catalysts")) > 0).count() > 0)
    assert(extracted.filter(size(col("reagents")) > 0).count() > 0)
  }

  test("trust extract: temperature multiset still matches golden (AZ)") {
    val g = spark.read.parquet(goldenDir + "/750_astrazeneca_eln_dataset.parquet")
    val o = extracted.filter(col("extracted_from_file").contains("00005539"))
    val gT = g.select("temperature").na.drop().as[Double].collect().sorted.toSeq
    val oT = o.select("temperature").na.drop().as[Double].collect().sorted.toSeq
    assert(gT == oT)
  }
}
