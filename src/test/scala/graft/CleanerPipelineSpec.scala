package graft

import org.apache.spark.sql.functions._

import graft.extract.IdentityChemistry
import graft.operators._

/** End-to-end clean + split + gen_fp over the reference's golden extracted
  * corpus, with the paper's `paper_gen_uspto_no_trust_no_map` flags
  * (Makefile:196). Property assertions are order-insensitive (SURVEY.md §5:
  * seeded-randomness semantics are hash-based, so exact-frame comparison
  * does not apply; the invariants do).
  */
class CleanerPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val goldenDir =
    "/root/reference/orderly/data/test_data/extracted_ord_test_data_dont_trust_labelling/extracted_ords"
  private val namesCsv =
    "/root/reference/orderly/data/test_data/extracted_ord_test_data_dont_trust_labelling/all_molecule_names.csv"

  // paper_gen_uspto_no_trust_no_map flags
  private val cfg = CleanConfig(
    numReactant = 2, numProduct = 1, numAgent = 3, numCat = 0, numReag = 0,
    numSolv = 2, consistentYield = false, minFrequencyOfOccurrence = 15,
    mapRareMoleculesToOther = false, scramble = true, trainSize = 0.9)

  private lazy val raw = ReactionTable.load(spark, goldenDir).cache()
  private lazy val badNames = spark.read.option("header", "true").csv(namesCsv)
    .collect().map(_.getString(0)).toSeq
  private lazy val cleaned =
    Cleaner.clean(raw, cfg.copy(moleculesToRemove = badNames)).cache()

  test("wide->array load preserves rows and aligns yields with products") {
    assert(raw.count() == 14798)
    val misaligned = raw.filter(size(col("products")) =!= size(col("yields"))).count()
    assert(misaligned == 0)
    // original_index is a dense 0..n-1 sequence
    val n = raw.count()
    assert(raw.agg(min("original_index"), max("original_index"))
      .as[(Long, Long)].collect()(0) == (0L, n - 1))
  }

  test("clean enforces every filter invariant") {
    val c = cleaned
    assert(c.count() > 0 && c.count() < raw.count())
    assert(c.filter(size(col("reactants")) === 0 || size(col("products")) === 0)
      .count() == 0) // C5
    assert(c.filter(size(col("reactants")) > cfg.numReactant).count() == 0) // C4
    assert(c.filter(size(col("products")) > cfg.numProduct).count() == 0)
    assert(c.filter(size(col("agents")) > cfg.numAgent).count() == 0)
    assert(c.filter(size(col("solvents")) > cfg.numSolv).count() == 0)
    assert(c.filter(array_sort(array_distinct(col("reactants")))
      === array_sort(array_distinct(col("products")))).count() == 0) // C7
    assert(c.filter(size(col("agents")) + size(col("solvents")) === 0)
      .count() == 0) // C6
  }

  test("clean removes listed molecule names in surviving rows") {
    val bad = badNames.toSet
    val offenders = cleaned.filter(
      Seq("reactants", "products", "agents", "solvents")
        .map(cc => size(array_intersect(col(cc),
          typedLit(badNames))) > 0).reduce(_ || _))
    // NullifyIfMapped: mapped rows are stripped, unmapped offenders deleted
    assert(offenders.filter(!col("is_mapped")).count() == 0)
  }

  test("dedup leaves no duplicate component tuples") {
    val key = md5(concat_ws("|",
      concat_ws(",", col("reactants")), concat_ws(",", col("products")),
      concat_ws(",", col("agents")), concat_ws(",", col("solvents")),
      concat_ws(",", col("yields").cast("array<string>"))))
    val dups = cleaned.groupBy(key).count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("rare-molecule removal: no value rare at the filter stage survives") {
    // Like the reference (clean/cleaner.py:370-396), rarity is judged on
    // the frame ENTERING the filter (counts are not recomputed after rows
    // drop). Reconstruct that stage input by skipping the rare step.
    val stageInput = Cleaner.clean(
      raw, cfg.copy(moleculesToRemove = badNames, minFrequencyOfOccurrence = 0,
        scramble = false))
    val rare = CleanOps.valueCountsArrays(stageInput, Seq("agents", "solvents"))
      .filter(col("cnt") < cfg.minFrequencyOfOccurrence)
      .select("value").as[String].collect().toSeq
    assert(rare.nonEmpty) // the threshold actually bites on this corpus
    val offenders = cleaned.filter(
      size(array_intersect(col("agents"), typedLit(rare))) > 0 ||
        size(array_intersect(col("solvents"), typedLit(rare))) > 0).count()
    assert(offenders == 0)
  }

  test("scramble permutes but preserves multisets and yield alignment") {
    val unscrambled = Cleaner.clean(
      raw, cfg.copy(moleculesToRemove = badNames, scramble = false))
    val a = cleaned.select(col("original_index"),
      array_sort(col("reactants")).as("r"))
    val b = unscrambled.select(col("original_index"),
      array_sort(col("reactants")).as("r2"))
    val joined = a.join(b, "original_index")
    assert(joined.filter(col("r") =!= col("r2")).count() == 0)
    assert(cleaned.filter(size(col("products")) =!= size(col("yields"))).count() == 0)
  }

  test("split + leakage move: no reaction hash in both splits; sizes sane") {
    val (train, test) = Cleaner.splitWithLeakageMove(cleaned, cfg)
    val h = md5(concat_ws(".", array_sort(concat(col("reactants"), col("products")))))
    val leak = train.select(h.as("h")).distinct()
      .join(test.select(h.as("h")).distinct(), "h").count()
    assert(leak == 0)
    val (nTrain, nTest) = (train.count(), test.count())
    assert(nTrain + nTest == cleaned.count())
    assert(nTrain.toDouble / (nTrain + nTest) > 0.85) // movers only add to train
  }

  test("gen_fp produces fixed-width fingerprint rows for every reaction") {
    val fp = Fingerprints.reactionFingerprints(cleaned, IdentityChemistry, 64)
    assert(fp.count() == cleaned.count())
    assert(fp.filter(size(col("fp")) =!= 128).count() == 0)
  }
}
