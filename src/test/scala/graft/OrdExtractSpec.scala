package graft

import org.apache.spark.sql.functions._

import graft.extract._

/** End-to-end extract parity against the reference's checked-in corpus:
  * raw `.pb.gz` → OrdWire decode → E1-E23 pipeline, compared to the golden
  * extracted parquet (dont_trust_labelling flavour) on chemistry-independent
  * fields. Chemistry-dependent values (canonical SMILES) are exact only
  * under a real canonicalizer (SURVEY.md §7.4.1), so component lists are
  * checked structurally, not by value.
  */
class OrdExtractSpec extends SparkSpec {
  import spark.implicits._

  private val ordDir = "/root/reference/orderly/data/test_data/ord_test_data"
  private val goldenDir =
    "/root/reference/orderly/data/test_data/extracted_ord_test_data_dont_trust_labelling/extracted_ords"

  private lazy val nested = OrdSource.readNested(spark, ordDir).cache()
  private lazy val extracted = Extract.extractReactions(
    nested, ExtractConfig(), IdentityChemistry,
    solventSet = Seq("O", "CO", "CCO", "C1CCOC1", "ClCCl")).cache()

  test("wire decoder reads every dataset and reaction") {
    val byFile = nested.groupBy("fileName").count()
      .as[(String, Long)].collect().toMap
    assert(byFile.size == 12)
    assert(byFile("ord_dataset-00005539a1e04c809a9a78647bea649c") == 750L)
  }

  test("AZ dataset: decoded yields and temperatures are populated") {
    val az = nested.filter(col("fileName").contains("00005539"))
    val n = az.count()
    val withYield = az.filter(exists(col("products"),
      p => p.getField("yieldPct").isNotNull)).count()
    val withTemp = az.filter(col("tempValue").isNotNull).count()
    assert(n == 750 && withYield == 750 && withTemp >= 740)
  }

  test("extraction keeps every reaction (labelling fallback, like golden)") {
    val golden = spark.read.parquet(goldenDir + "/*.parquet")
    val ours = extracted.count()
    assert(ours == golden.count(), s"ours=$ours golden=${golden.count()}")
  }

  test("chemistry-independent scalars match golden on the AZ dataset") {
    val g = spark.read.parquet(
      goldenDir + "/750_astrazeneca_eln_dataset.parquet")
    val o = extracted.filter(col("extracted_from_file").contains("00005539"))
    assert(o.count() == g.count())
    // temperature: non-null counts and exact value multiset
    val gTemps = g.select("temperature").na.drop().as[Double]
      .collect().sorted.toSeq
    val oTemps = o.select("temperature").na.drop().as[Double]
      .collect().sorted.toSeq
    assert(oTemps == gTemps)
    // is_mapped distribution
    assert(
      o.filter(col("is_mapped")).count() == g.filter(col("is_mapped")).count())
    // experiment dates populated like golden
    assert(o.filter(col("date_of_experiment").isNotNull).count() ==
      g.filter(col("date_of_experiment").isNotNull).count())
    // AZ has no reaction strings: golden holds the sentinel, ours null
    assert(g.filter(col("rxn_str") =!= "<missing>").count() == 0)
    assert(o.filter(col("rxn_str").isNotNull).count() == 0)
  }

  test("USPTO file: rxn_str sets match golden exactly") {
    val g = spark.read.parquet(goldenDir + "/uspto-grants-1976_01.parquet")
    val files = extractedFileNames(g)
    val o = extracted.filter(col("extracted_from_file").isin(files: _*))
    val gStr = g.filter(col("rxn_str") =!= "<missing>")
      .select("rxn_str").as[String].collect().toSet
    val oStr = o.filter(col("rxn_str").isNotNull)
      .select("rxn_str").as[String].collect().toSet
    assert(gStr == oStr,
      s"only-golden=${(gStr -- oStr).take(2)} only-ours=${(oStr -- gStr).take(2)}")
  }

  test("USPTO file: rxn_time conversions match golden") {
    val g = spark.read.parquet(goldenDir + "/uspto-grants-1976_01.parquet")
    val gf = nested.filter(col("fileName").isin(
      extractedFileNames(g): _*))
    val o = extracted.filter(col("extracted_from_file").isin(
      extractedFileNames(g): _*))
    val gTimes = g.select("rxn_time").na.drop().as[Double].collect().sorted.toSeq
    val oTimes = o.select("rxn_time").na.drop().as[Double].collect().sorted.toSeq
    assert(oTimes == gTimes, s"ours=${oTimes.take(5)} golden=${gTimes.take(5)}")
  }

  private def extractedFileNames(g: org.apache.spark.sql.DataFrame): Seq[String] =
    g.select("extracted_from_file").distinct().as[String].collect().toSeq

  test("wide sink codec produces reference column layout") {
    val wide = Extract.toWideSink(extracted.limit(10),
      Map("reactants" -> 2, "agents" -> 3, "solvents" -> 2,
        "products" -> 1, "yields" -> 1))
    val cols = wide.columns.toSet
    assert(Set("reactant_000", "reactant_001", "agent_000", "agent_002",
      "solvent_000", "product_000", "yield_000").subsetOf(cols))
  }
}
