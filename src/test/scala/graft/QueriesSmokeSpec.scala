package graft

/** Smoke: every registered query runs at sf0.001 and yields a sane result.
  * Exact-value correctness is covered by the DuckDB oracle gate
  * (tools/check.py locally, driver CORRECTNESS_r{N}.json per round).
  */
class QueriesSmokeSpec extends SparkSpec {
  // q08 (anti join) can legitimately be empty; q12's rare-row filter drops
  // everything at sf0.001 (all p_type counts < minFreq at that scale).
  private val mayBeEmpty = Set("q08_anti_join", "q12_remove_rare")

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
