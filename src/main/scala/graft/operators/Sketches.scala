package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.XHash

/** Mergeable sketch operators for corpus statistics at 100 TB.
  *
  * A count-min sketch replaces an unbounded `groupBy(term)` dictionary with
  * a FIXED d×w counter grid: every partition's grid merges by cell-wise
  * addition (a plain map-side-combinable aggregate here), so the shuffle
  * carries at most d·w rows regardless of vocabulary size — the standard
  * trick when the exact dictionary itself is too large to materialize but
  * heavy-hitter counts are still needed. Estimates are biased UP only
  * (cell collisions add, never subtract): `min` over the d rows is the
  * classic Cormode-Muthukrishnan point query.
  *
  * The row-hash family reuses [[XHash.bucketHash]] (md5-based), so a SQL
  * oracle reproduces every cell and estimate bit-for-bit — no RNG, no
  * engine-private hash.
  */
object Sketches {

  /** Build the d×w counter grid from exploded `(term)` rows: one output
    * row per non-empty cell `(r, c, cnt)`. Shuffle width ≤ d·w. */
  def cmsCounters(terms: DataFrame, term: String, depth: Int,
      width: Int): DataFrame = {
    val rows = explode(sequence(lit(0), lit(depth - 1))).as("r")
    terms.select(col(term).as("__t")).select(col("__t"), rows)
      .select(col("r"),
        XHash.bucket("cms", width, col("r").cast("string"), col("__t")).as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the grid for each row of `queries`: estimate =
    * min over the d (row, cell) counters. The join is d rows per queried
    * term against the ≤ d·w-row grid — broadcast-sized by construction. */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, term: String,
      depth: Int, width: Int): DataFrame = {
    val probes = queries.select(col(term))
      .withColumn("r", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("c",
        XHash.bucket("cms", width, col("r").cast("string"), col(term)))
    probes.join(broadcast(counters), Seq("r", "c"), "left")
      .groupBy(term)
      // a missing cell means nothing hashed there: count 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_cnt"))
  }
}
