package graft

import org.apache.spark.sql.functions._

import graft.extract._

/** StructuralChemistry as a drop-in Chemistry implementation: Column-level
  * behavior, and the full extract pipeline running with it end-to-end.
  */
class StructuralChemistrySpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize unifies equivalent writings at the Column level") {
    val df = Seq("OCC", "CCO", "C(C)O", "not a molecule").toDF("s")
    val out = df.select(StructuralChemistry.canonicalize(col("s")).as("c"))
      .as[Option[String]].collect().toSeq
    assert(out(0) == out(1) && out(1) == out(2) && out(0).isDefined)
    assert(out(3).isEmpty)
  }

  test("full golden corpus canonicalizes idempotently (55k real molecules)") {
    val dir = "/root/reference/orderly/data/test_data/ord_test_data"
    assume(new java.io.File(dir).exists(), "reference checkout not present")
    val nested = OrdSource.readNested(spark, dir)
    val out = Extract.extractReactions(
      nested, ExtractConfig(), StructuralChemistry,
      solventSet = Seq("O", "CO", "CCO", "C1CCOC1", "ClCCl"))
    assert(out.count() == 14798)
    // distributed idempotence sweep: canonical(canonical(m)) == canonical(m)
    // over every distinct molecule the pipeline emitted (real USPTO SMILES:
    // kekulized aromatics, stereo, charges, isotopes, the lot)
    val canonU = udf((s: String) => Smiles.canonical(s).orNull)
    val mols = out
      .select(explode(concat(
        col("reactants"), col("agents"), col("solvents"), col("products"))).as("m"))
      .filter(col("m").isNotNull).distinct()
    val notIdempotent = mols
      .withColumn("c1", canonU(col("m"))).filter(col("c1").isNotNull)
      .withColumn("c2", canonU(col("c1")))
      .filter(col("c2").isNull || col("c2") =!= col("c1"))
    assert(notIdempotent.count() == 0,
      notIdempotent.limit(5).collect().mkString("; "))
  }

  test("full extract pipeline runs with StructuralChemistry") {
    val nested = OrdSource.readNested(spark,
      "/root/reference/orderly/data/test_data/ord_test_data")
      .filter(col("fileName").contains("00005539"))
    val structural = Extract.extractReactions(
      nested, ExtractConfig(), StructuralChemistry,
      solventSet = Seq("O", "CO", "CCO", "C1CCOC1", "ClCCl"))
    val identity = Extract.extractReactions(
      nested, ExtractConfig(), IdentityChemistry,
      solventSet = Seq("O", "CO", "CCO", "C1CCOC1", "ClCCl"))
    // same reactions survive; canonicalization only rewrites molecule strings
    assert(structural.count() == identity.count())
    // structural canonicalization is idempotent over the extracted output
    val mols = structural
      .select(explode(concat(col("reactants"), col("products"))).as("m"))
      .filter(col("m").isNotNull).distinct().as[String].collect()
    val parseable = mols.flatMap(m => Smiles.canonical(m).map(m -> _))
    assert(parseable.nonEmpty)
    parseable.foreach { case (m, c) =>
      assert(Smiles.canonical(c).contains(c), s"not idempotent: $m")
    }
  }
}
