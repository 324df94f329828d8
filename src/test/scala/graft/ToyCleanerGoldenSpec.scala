package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayOps
import graft.operators.{CleanOps, ReactionTable, Relational}

/** The reference's toy cleaner frame and expectation tables, ported
  * verbatim (/root/reference/tests/test_clean.py:12-26 fixture; value-count
  * tables :310-333; width-trim cases :393+; scramble invariant :362).
  * The wide toy frame goes through our wide→array codec first — exercising
  * the same entry path as real data.
  */
class ToyCleanerGoldenSpec extends SparkSpec {
  import spark.implicits._

  // test_clean.py:12-26 toy_dict, wide layout (pd.NA → null)
  private lazy val toyWide = Seq(
    ("B", Some("D"), "C", "E", "D", "C", "E", "C", "D"),
    ("A", Some("A"), "A", "G", "F", "E", "B", "D", "B"),
    ("F", Option.empty[String], "E", "C", "D", "G", "G", "B", "F"),
    ("A", Some("B"), "A", "H", "B", "A", "C", "G", "G")
  ).toDF("reactant_000", "reactant_001", "product_000", "product_001",
    "agent_000", "agent_001", "solvent_000", "solvent_001", "solvent_002")

  private lazy val toy = ReactionTable.fromWide(spark, toyWide)

  test("C9 golden: value counts across all columns") {
    // expected {"A":6,"B":6,"C":5,"D":5,"E":4,"F":3,"G":5,"H":1}
    val got = CleanOps.valueCountsArrays(toy,
      Seq("reactants", "products", "agents", "solvents"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 6, "B" -> 6, "C" -> 5, "D" -> 5,
      "E" -> 4, "F" -> 3, "G" -> 5, "H" -> 1))
  }

  test("C9 golden: value counts across agent+solvent columns") {
    // expected {"A":1,"B":4,"C":3,"D":4,"E":2,"F":2,"G":4}
    val got = CleanOps.valueCountsArrays(toy, Seq("agents", "solvents"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1, "B" -> 4, "C" -> 3, "D" -> 4,
      "E" -> 2, "F" -> 2, "G" -> 4))
  }

  test("C4 golden: width trim to 1 reactant keeps only the F row") {
    val kept = CleanOps.trimComponents(toy, "reactants", 1)
    val rows = kept.select("reactants", "products", "agents", "solvents")
      .as[(Seq[String], Seq[String], Seq[String], Seq[String])].collect()
    assert(rows.toSeq == Seq(
      (Seq("F"), Seq("E", "C"), Seq("D", "G"), Seq("G", "B", "F"))))
    // k >= max width keeps everything (the reference's pad case)
    assert(CleanOps.trimComponents(toy, "reactants", 3).count() == 4)
  }

  test("C15 golden invariant: scramble permutes within the row only") {
    val withId = toy.withColumn("rid", monotonically_increasing_id())
    val scrambled = Seq("reactants", "agents", "solvents").foldLeft(withId) {
      (d, c) => d.withColumn(c, ArrayOps.scramble(col(c), "s", col("rid")))
    }
    val before = withId
      .select(array_sort(concat(col("reactants"), col("agents"), col("solvents"))))
      .as[Seq[String]].collect().toSet
    val after = scrambled
      .select(array_sort(concat(col("reactants"), col("agents"), col("solvents"))))
      .as[Seq[String]].collect().toSet
    assert(before == after)
  }
}
