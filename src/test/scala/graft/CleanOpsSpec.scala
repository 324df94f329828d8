package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{ArrayOps, Conversions}
import graft.operators.CleanOps

/** Unit tests for the cleaning-stage operators over toy frames — the Scala
  * port of the reference's cleaner unit tests
  * (/root/reference/orderly/tests/test_clean.py:12-26 toy frame; golden
  * expectations carried over as data, per SURVEY.md §5).
  */
class CleanOpsSpec extends SparkSpec {
  import spark.implicits._

  // Toy reaction frame: (reactants, agents, solvents, products, yields, is_mapped)
  private def toy = Seq(
    (Seq("A", "B"), Seq("cat1"), Seq("s1", "s2"), Seq("P1"), Seq(Some(90.0)), true),
    (Seq("A", "bad"), Seq("cat1"), Seq("s1"), Seq("P2"), Seq(Some(50.0)), true),
    (Seq("C", "bad"), Seq("cat2"), Seq("s2"), Seq("P3"), Seq(Some(10.0)), false),
    (Seq("C"), Seq(), Seq(), Seq("C"), Seq(None: Option[Double]), false)
  ).toDF("reactants", "agents", "solvents", "products", "yields", "is_mapped")

  private val comps = Seq("reactants", "agents", "solvents", "products")

  test("C2 NullifyIfMapped: mapped rows stripped, unmapped bad rows deleted") {
    val out = CleanOps.handleBadNames(toy, comps, Seq("bad"), CleanOps.NullifyIfMapped)
    val rows = out.select("reactants", "is_mapped").collect()
    assert(rows.length == 3) // row 3 (unmapped, has bad) deleted
    val mapped = rows.filter(_.getBoolean(1)).map(_.getSeq[String](0).toList).toSet
    assert(mapped == Set(List("A", "B"), List("A"))) // "bad" removed from mapped row
  }

  test("C2 DeleteAll / NullAll") {
    assert(CleanOps.handleBadNames(toy, comps, Seq("bad"), CleanOps.DeleteAll).count() == 2)
    val na = CleanOps.handleBadNames(toy, comps, Seq("bad"), CleanOps.NullAll)
    assert(na.count() == 4)
    assert(!na.select("reactants").as[Seq[String]].collect().exists(_.contains("bad")))
  }

  test("C3 catalyst overflow renames into reagents") {
    val df = Seq((Seq("c1", "c2", "c3"), Seq("r1")))
      .toDF("catalysts", "reagents")
    val out = CleanOps.renameCatalystOverflow(df, 1).collect()(0)
    assert(out.getSeq[String](0) == Seq("c1"))
    assert(out.getSeq[String](1) == Seq("r1", "c2", "c3"))
  }

  test("C4 trim keeps rows within width; k=-1 keeps all") {
    assert(CleanOps.trimComponents(toy, "reactants", 1).count() == 1)
    assert(CleanOps.trimComponents(toy, "reactants", -1).count() == 4)
  }

  test("C5/C6 emptiness filters") {
    assert(CleanOps.requireNonEmpty(toy, "agents").count() == 3)
    assert(CleanOps.requireAnyCondition(toy, Seq("agents", "solvents")).count() == 3)
  }

  test("C7 drops rows where reactant set == product set") {
    val out = CleanOps.dropNoopReactions(toy)
    assert(out.count() == 3) // row 4: C -> C is a no-op
  }

  test("C8 yield consistency") {
    val df = Seq(
      (1, Seq(Some(50.0), Some(40.0))),   // ok
      (2, Seq(Some(60.0), Some(60.0))),   // sum > 100
      (3, Seq(Some(-5.0))),               // out of range
      (4, Seq(None: Option[Double]))      // null ok
    ).toDF("id", "yields")
    val kept = CleanOps.filterYieldConsistent(df).select("id").as[Int].collect().toSet
    assert(kept == Set(1, 4))
  }

  test("C9/C10/C11 over arrays: counts, rare->other, rare-row removal") {
    val vc = CleanOps.valueCountsArrays(toy, Seq("agents", "solvents"))
      .as[(String, Long)].collect().toMap
    assert(vc == Map("cat1" -> 2, "cat2" -> 1, "s1" -> 2, "s2" -> 2))

    val mapped = CleanOps.mapRareToOtherArrays(toy, Seq("agents", "solvents"), 2)
    val ags = mapped.select("agents").as[Seq[String]].collect().flatten
    assert(ags.count(_ == "other") == 1 && !ags.contains("cat2"))

    assert(CleanOps.removeRareRowsArrays(toy, Seq("agents", "solvents"), 2).count() == 3)
  }

  test("C10/C11 join-path fallback matches the literal-set path") {
    // maxLiteralSet = 0 forces the fully-distributed join form
    val keyed = toy.withColumn("original_index",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("reactants")).cast("long"))
    val cols = Seq("agents", "solvents")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("original_index", "agents", "solvents")
        .as[(Long, Seq[String], Seq[String])].collect().sortBy(_._1).toSeq

    assert(norm(CleanOps.mapRareToOtherArrays(keyed, cols, 2, maxLiteralSet = 0))
      == norm(CleanOps.mapRareToOtherArrays(keyed, cols, 2)))
    assert(norm(CleanOps.removeRareRowsArrays(keyed, cols, 2, maxLiteralSet = 0))
      == norm(CleanOps.removeRareRowsArrays(keyed, cols, 2)))
  }

  test("C11 null-array rows: kept unless a sibling column is rare, both paths") {
    // "a" is frequent (3 uses), "rare" appears once
    val df = Seq(
      (1L, Some(Seq("a")), Some(Seq("a"))),
      (2L, None: Option[Seq[String]], Some(Seq("a"))), // null list, no rare → keep
      (3L, None: Option[Seq[String]], Some(Seq("rare"))), // null list, rare sibling → drop
      (4L, Some(Seq("a")), None: Option[Seq[String]]) // keep
    ).toDF("original_index", "agents", "solvents")
    val cols = Seq("agents", "solvents")
    def kept(maxLit: Int) =
      CleanOps.removeRareRowsArrays(df, cols, 2, maxLiteralSet = maxLit)
        .select("original_index").as[Long].collect().sorted.toSeq
    assert(kept(100) == Seq(1L, 2L, 4L)) // literal path
    assert(kept(0) == Seq(1L, 2L, 4L)) // join path
  }

  test("E16 aligned filter co-drops yields with products") {
    val df = Seq((Seq("P1", "", "P2"), Seq(Some(10.0), Some(20.0), None: Option[Double])))
      .toDF("products", "yields")
    val out = df.select(
      ArrayOps.alignedFilter(col("products"), col("yields"), p => p =!= "").as("r"))
      .select("r.kept", "r.keptAligned").collect()(0)
    assert(out.getSeq[String](0) == Seq("P1", "P2"))
    assert(out.getSeq[java.lang.Double](1) == Seq(10.0, null))
  }

  test("E17 move-to-end is a stable partition") {
    val df = Seq(Tuple1(Seq("x", "name1", "y", "name2"))).toDF("l")
    val bad = Seq("name1", "name2")
    val out = df.select(
      ArrayOps.moveToEnd(col("l"), x => x.isin(bad: _*)).as("m"))
      .as[Seq[String]].collect()(0)
    assert(out == Seq("x", "y", "name1", "name2"))
  }

  test("E21 pad + E23 wide codec round-trip") {
    val df = Seq(Tuple1(Seq("a", "b"))).toDF("l")
    val padded = df.select(ArrayOps.padTo(col("l"), lit(4)).as("p"))
      .as[Seq[Option[String]]].collect()(0)
    assert(padded == Seq(Some("a"), Some("b"), None, None))

    val wide = df.select(ArrayOps.toWide(col("l"), "c", 3): _*)
    assert(wide.columns.toSeq == Seq("c_000", "c_001", "c_002"))
    assert(wide.collect()(0).toSeq == Seq("a", "b", "<missing>"))
    val back = wide.select(ArrayOps.fromWide(
      Seq(col("c_000"), col("c_001"), col("c_002"))).as("l"))
      .as[Seq[String]].collect()(0)
    assert(back == Seq("a", "b"))
  }

  test("C15 scramble is a deterministic permutation") {
    val df = Seq((1L, Seq("a", "b", "c", "d", "e"))).toDF("id", "l")
    val s1 = df.select(ArrayOps.scramble(col("l"), "seed", col("id")).as("s"))
      .as[Seq[String]].collect()(0)
    val s2 = df.select(ArrayOps.scramble(col("l"), "seed", col("id")).as("s"))
      .as[Seq[String]].collect()(0)
    assert(s1 == s2 && s1.sorted == Seq("a", "b", "c", "d", "e") && s1 != Seq("a", "b", "c", "d", "e"))
  }

  test("E15 numeric strings dropped") {
    val df = Seq(Tuple1(Seq("12", "abc", "3.5", "x1"))).toDF("l")
    assert(df.select(ArrayOps.dropNumeric(col("l")).as("l"))
      .as[Seq[String]].collect()(0) == Seq("abc", "x1"))
  }

  test("E6/E7 unit conversions match the reference's tables") {
    // extract/extractor.py:423-474 golden cases
    val df = Seq(
      (212.0, 2, 0),   // F -> 100 C
      (300.0, 3, 0),   // K -> 26.85 C
      (0.0, 0, 6),     // ICE_BATH -> 0
      (0.0, 0, 9),     // DRY_ICE -> -78.5
      (0.0, 0, 11)     // LIQ_N2 -> -196
    ).toDF("v", "unit", "ctrl")
    val out = df.select(Conversions.temperatureToCelsius(col("v"), col("unit"), col("ctrl")))
      .as[Double].collect()
    assert(math.abs(out(0) - 100.0) < 1e-9)
    assert(math.abs(out(1) - 26.85) < 1e-9)
    assert(out(2) == 0.0 && out(3) == -78.5 && out(4) == -196.0)

    val t = Seq((90.0, 2), (7200.0, 3), (2.0, 4), (1.5, 1)).toDF("v", "unit")
    val hrs = t.select(Conversions.rxnTimeToHours(col("v"), col("unit"))).as[Double].collect()
    assert(hrs.toSeq == Seq(1.5, 2.0, 48.0, 1.5))
  }

  test("E9 date parse coerces invalid to null") {
    val df = Seq("03/01/1997", "13/45/1997", "garbage").toDF("s")
    val out = df.select(Conversions.parseUsDate(col("s"))).collect().map(_.get(0))
    assert(out(0) != null && out(1) == null && out(2) == null)
  }

  test("E24 filename normalization + grant date") {
    val df = Seq("uspto-grants-1995_11.pb.gz").toDF("f")
    val g = df.select(Conversions.grantDateFromFilename(col("f"))).collect()(0).getDate(0)
    assert(g.toString == "1995-11-01")
  }
}
