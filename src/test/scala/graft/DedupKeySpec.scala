package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** C13 collision-resistance of the Cleaner's dedup key.
  *
  * The key serializes array columns with explicit separators and a null
  * sentinel; rows that differ only in element boundaries (["CC","O"] vs
  * ["C","CO"]) or in null placement (yields ["50",null] vs [null,"50"])
  * must survive dedup as distinct, while true duplicates still collapse.
  * The reference dedups on exact column equality (clean/cleaner.py:767-794),
  * so any serialization collision is a silent wrong answer.
  */
class DedupKeySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = CleanConfig(
    consistentYield = false, minFrequencyOfOccurrence = 0, scramble = false)

  private def table(rows: Seq[(Long, Seq[String], Seq[String], Seq[String], Seq[Option[Double]])] ) =
    rows.toDF("original_index", "reactants", "products", "agents", "yields")
      .withColumn("yields", col("yields").cast("array<double>"))
      .withColumn("is_mapped", lit(true))

  test("element-boundary shifts do not collide") {
    val df = table(Seq(
      (0L, Seq("CC", "O"), Seq("CCO"), Seq("x"), Seq(Some(50.0))),
      (1L, Seq("C", "CO"), Seq("CCO"), Seq("x"), Seq(Some(50.0)))))
    assert(Cleaner.clean(df, cfg).count() == 2)
  }

  test("column-boundary shifts do not collide") {
    // last reactant vs first product swap across the column separator
    val df = table(Seq(
      (0L, Seq("CC", "O"), Seq("N", "CCO"), Seq("x"), Seq(Some(1.0), Some(2.0))),
      (1L, Seq("CC"), Seq("O", "N", "CCO"), Seq("x"), Seq(Some(1.0), Some(2.0), Some(3.0)))))
    assert(Cleaner.clean(df, cfg).count() == 2)
  }

  test("null placement in yields does not collide") {
    val df = table(Seq(
      (0L, Seq("R"), Seq("P1", "P2"), Seq("x"), Seq(Some(50.0), None)),
      (1L, Seq("R"), Seq("P1", "P2"), Seq("x"), Seq(None, Some(50.0)))))
    assert(Cleaner.clean(df, cfg).count() == 2)
  }

  test("true duplicates still collapse to one row") {
    val df = table(Seq(
      (0L, Seq("CC", "O"), Seq("CCO"), Seq("x"), Seq(Some(50.0))),
      (1L, Seq("CC", "O"), Seq("CCO"), Seq("x"), Seq(Some(50.0))),
      (2L, Seq("CC", "O"), Seq("CCO"), Seq("x"), Seq(None))))
    assert(Cleaner.clean(df, cfg).count() == 2)
  }
}
