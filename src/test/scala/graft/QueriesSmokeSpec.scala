package graft

/** Smoke: every registered query runs at sf0.001 and yields a sane result.
  * Exact-value correctness is covered by the DuckDB oracle gate
  * (tools/check.py locally, driver CORRECTNESS_r{N}.json per round).
  */
class QueriesSmokeSpec extends SparkSpec {
  // q08 (anti join) can legitimately be empty; everything else must not be.
  private val mayBeEmpty = Set("q08_anti_join")

  SparkEntry.allDefs.foreach { d =>
    test(s"${d.name} runs") {
      val out = d.fn(spark, sf0001)
      val n = out.count()
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
