package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cleaner, CleanConfig, ReactionTable}

/** TODO-list correctness checks: yield alignment under duplicate products,
  * original_index stability through cleaning (tests/test_clean.py:1226
  * analogue), and the wide-sink round trip.
  */
class AlignmentSpec extends SparkSpec {
  import spark.implicits._

  test("duplicate products: equality-scan yield match takes the first yield") {
    // Documents the current semantic (matches the reference's first-match
    // equality scan, extract/extractor.py:518-543).
    val labProducts = Seq((Seq(("P", Some(30.0)), ("P", Some(60.0)))))
      .map { s => s.map { case (p, y) => (p, y) } }
    val df = Seq((Seq("P", "P"), Seq(("P", Option(30.0)), ("P", Option(60.0)))))
      .toDF("products", "lab")
      .withColumn("lab", transform(col("lab"),
        z => struct(z.getField("_1").as("smiles"), z.getField("_2").as("yield"))))
    val yields = df.select(transform(col("products"), p =>
      try_element_at(filter(col("lab"), lp => lp.getField("smiles") === p), lit(1))
        .getField("yield")).as("y"))
      .as[Seq[Option[Double]]].collect()(0)
    assert(yields == Seq(Some(30.0), Some(30.0)))
  }

  test("original_index is stable through cleaning (surviving rows keep ids)") {
    val goldenDir =
      "/root/reference/orderly/data/test_data/extracted_ord_test_data_dont_trust_labelling/extracted_ords"
    val raw = ReactionTable.load(spark, goldenDir)
    val cleaned = Cleaner.clean(raw, CleanConfig(
      numReactant = 2, numProduct = 1, numAgent = 3, numSolv = 2,
      consistentYield = false, minFrequencyOfOccurrence = 0, scramble = false))
    // every surviving original_index existed in the input with identical
    // reactant multiset
    val joined = cleaned.select(col("original_index"),
        array_sort(col("reactants")).as("r"))
      .join(raw.select(col("original_index"),
        array_sort(col("reactants")).as("r0")), "original_index")
    assert(joined.count() == cleaned.count())
    assert(joined.filter(col("r") =!= col("r0")).count() == 0)
  }

  test("wide sink round-trips through the array loader") {
    val df = Seq(
      ("f1", Seq("r1", "r2"), Seq("a1"), Seq("s1"), Seq("p1"), Seq(Option(90.0))),
      ("f1", Seq("r3"), Seq[String](), Seq("s1", "s2"), Seq("p2", "p3"),
        Seq(Option(50.0), Option.empty[Double]))
    ).toDF("extracted_from_file", "reactants", "agents", "solvents", "products", "yields")
    val wide = graft.extract.Extract.toWideSink(df,
      Map("reactants" -> 3, "agents" -> 2, "solvents" -> 2,
        "products" -> 2, "yields" -> 2))
    val back = ReactionTable.fromWide(spark, wide)
    val got = back.select("reactants", "agents", "products", "yields")
      .as[(Seq[String], Seq[String], Seq[String], Seq[Option[Double]])]
      .collect().toSet
    assert(got == Set(
      (Seq("r1", "r2"), Seq("a1"), Seq("p1"), Seq(Option(90.0))),
      (Seq("r3"), Seq[String](), Seq("p2", "p3"),
        Seq(Option(50.0), Option.empty[Double]))))
  }
}
