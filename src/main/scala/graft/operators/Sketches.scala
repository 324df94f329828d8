package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** HLL register count: fixed at 64 (b = 6 index bits), leaving 54 hash
    * bits for the rank. */
  val hllM = 64

  /** α₆₄ of the HLL estimator, computed once on the driver and embedded as
    * the SAME literal in the plan and the oracle SQL. */
  val hllAlpha: Double = 0.7213 / (1.0 + 1.079 / hllM)

  /** HyperLogLog registers over exploded `(term)` rows: 64 registers, each
    * the max "rank" (1 + leading-zero count of the 54 post-index hash bits,
    * computed as an integer string-length of `bin()` — no float log).
    * A map-side-combinable `max` aggregate over ≤64 keys: the shuffle
    * carries 64 rows per partition however large the corpus — the standard
    * mergeable distinct-count sketch. */
  def hllRegisters(terms: DataFrame, term: String): DataFrame = {
    val h = XHash.bucketHash("hll", col(term))
    // top 54 bits via a shift — Column./ is DOUBLE division, inexact past
    // 2^53; the oracle's `h // 64` is the same integer shift
    val v = shiftright(h, 6)
    terms.select(
        pmod(h, lit(hllM.toLong)).as("reg"),
        when(v === 0, lit(55)).otherwise(lit(55) - length(bin(v))).as("rank"))
      .groupBy("reg").agg(max(col("rank")).as("rank"))
  }

  /** Raw HLL point estimate from the registers: αm·m²/Σ2^(−rank), absent
    * registers counting rank 0. The harmonic sum folds in register order
    * (sorted 64-element array), and 2^(−rank) is an exact dyadic double —
    * the oracle reproduces the estimate bit-for-bit. Raw estimator only
    * (no small-range linear-counting correction): the corpus regime this
    * targets is far above 2.5·m distinct values. */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val spark = regs.sparkSession
    val full = spark.range(0, hllM).select(col("id").as("reg"))
      .join(regs, Seq("reg"), "left")
      .select(col("reg"), coalesce(col("rank"), lit(0)).as("rank"))
    full.agg(sort_array(collect_list(struct(col("reg"), col("rank")))).as("rs"))
      .select(aggregate(col("rs"),
        lit(0.0), (acc, x) => acc + pow(lit(0.5), x.getField("rank"))).as("hsum"))
      .select((lit(hllAlpha) * hllM * hllM / col("hsum")).as("est_distinct"))
  }

  /** [[hllRegisters]] per group: the shuffle carries ≤ 64 rows PER GROUP
    * however many values each group holds — the per-dimension distinct
    * profile (NDV by source/date/tenant) that exact count_distinct can't
    * give without a (group, value) exchange of the whole corpus. Register
    * rows are max-mergeable across partitions, files, and days. */
  def hllRegistersGrouped(terms: DataFrame, group: String, term: String): DataFrame = {
    val h = XHash.bucketHash("hll", col(term))
    val v = shiftright(h, 6)
    terms.select(col(group),
        pmod(h, lit(hllM.toLong)).as("reg"),
        when(v === 0, lit(55)).otherwise(lit(55) - length(bin(v))).as("rank"))
      .groupBy(col(group), col("reg")).agg(max(col("rank")).as("rank"))
  }

  /** Per-group raw estimate from grouped registers. Absent registers each
    * contribute 2⁻⁰ = 1 to the harmonic sum, added as ONE exact integer
    * term (64 − #present) — no fill join. Present terms fold in register
    * order; every term is a dyadic double, so the estimate is
    * bit-identical across engines and partitionings. */
  def hllEstimateGrouped(regs: DataFrame, group: String): DataFrame =
    regs.groupBy(col(group))
      .agg(sort_array(collect_list(struct(col("reg"), col("rank")))).as("rs"))
      .select(col(group),
        (aggregate(col("rs"), lit(0.0),
          (acc, x) => acc + pow(lit(0.5), x.getField("rank")))
          + (lit(hllM) - size(col("rs")))).as("hsum"))
      .select(col(group),
        (lit(hllAlpha) * hllM * hllM / col("hsum")).as("est_distinct"))

  /** Exact global quantiles WITHOUT a global sort — the mergeable-histogram
    * companion to the sketch family (the TODO's "quantile sketch with
    * deterministic two-pass exact refinement").
    *
    * Pass 0 (map-side `min`/`max`) fixes an equi-width binning of the value
    * domain; pass 1 histograms the bins with a map-side-combining aggregate
    * (shuffle ≤ `bins` rows however large the input) and a cumulative sum
    * over the ≤`bins`-row histogram locates, for each requested percentile
    * `p`, the bin holding rank `ceil(n·p/100)` (integer-only as
    * `(n·p + 99) div 100`, matching the oracle's `//`); pass 2 ranks ONLY
    * the rows of the chosen bins (~n/bins rows each, never a whole-corpus
    * reducer) and picks the exact order statistic. Equal values always land
    * in the same bin (bins partition the value domain), so the selected
    * value is tie-invariant and bit-identical to a full sort.
    *
    * Value domain must be integral (long-valued); bin arithmetic is pure
    * long math (`width = ceil(range/bins)`), no float boundaries.
    */
  def histogramQuantiles(df: DataFrame, value: Column,
      pcts: Seq[Int], bins: Int = 4096): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(value.cast("long").as("__v"))
    // pass 0: domain bounds + row count — one map-side-combined row
    val bounds = v.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
      count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // equi-width long bins: width = ceil((hi-lo+1)/bins) ≥ 1, pure long math
    val withW = bounds.select(col("__lo"), col("__n"),
      expr(s"(__hi - __lo + $bins) div $bins").as("__w"))
    // `binned` feeds BOTH pass 1 (histogram) and pass 2 (boundary-bin rank);
    // unpinned, each pass re-runs the scan + binning (r6 bench: 18.8 s at
    // sf0.1, 3 scans). Two narrow longs per row, MEMORY_AND_DISK: at 100 TB
    // it spills or evicts and the two-scan structure stays correct.
    val binned = v.crossJoin(broadcast(withW))
      .select(col("__v"), expr("(__v - __lo) div __w").as("__bin"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: the histogram is ≤`bins` rows after the map-side combine; the
    // unpartitioned cum-sum window over it is bounded by `bins`, never by n
    val hist = binned.groupBy("__bin").agg(count(lit(1)).as("__bc"))
      .withColumn("__cum", sum(col("__bc")).over(Window.orderBy(col("__bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__below", col("__cum") - col("__bc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // rank of percentile p: ceil(n·p/100), integer-only (oracle: `//`)
    val probes = pcts.toDF("pct")
      .crossJoin(broadcast(bounds.select(col("__n"))))
      .withColumn("__rank", expr("(__n * pct + 99) div 100"))
      .drop("__n")
    val probeBins = probes.join(broadcast(hist),
        col("__rank") > col("__below") && col("__rank") <= col("__cum"))
      .select(col("pct"), col("__rank"), col("__bin"), col("__below"))
    // pass 2: rank ONLY the chosen bins' rows (~n/bins per probe)
    binned.join(broadcast(probeBins), "__bin")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("pct")).orderBy(col("__v"))))
      .filter(col("__below") + col("__rn") === col("__rank"))
      .select(col("pct"), col("__rank").as("qrank"), col("__v").as("qvalue"))
  }

  /** SQL-standard `percentile_cont` (linear interpolation between order
    * statistics) on the same two-pass histogram — no global sort. For
    * percentile p over n rows, h = 1 + (n−1)·p/100; the result interpolates
    * the values at ⌊h⌋ and ⌈h⌉: `lo + (hi − lo) · frac` with
    * frac = ((n−1)·p mod 100)/100. Ranks are integer-only; the
    * interpolation is exact long→double + one multiply/add (IEEE-determined
    * in both engines). One extra probe per percentile vs
    * [[histogramQuantiles]] — same shuffle bounds.
    */
  def histogramQuantilesCont(df: DataFrame, value: Column,
      pcts: Seq[Int], bins: Int = 4096): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100))
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(value.cast("long").as("__v"))
    val bounds = v.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"),
      count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withW = bounds.select(col("__lo"), col("__n"),
      expr(s"(__hi - __lo + $bins) div $bins").as("__w"))
    val binned = v.crossJoin(broadcast(withW))
      .select(col("__v"), expr("(__v - __lo) div __w").as("__bin"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)  // see histogramQuantiles
    val hist = binned.groupBy("__bin").agg(count(lit(1)).as("__bc"))
      .withColumn("__cum", sum(col("__bc")).over(Window.orderBy(col("__bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__below", col("__cum") - col("__bc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = pcts.toDF("pct")
      .crossJoin(broadcast(bounds.select(col("__n"))))
      .withColumn("__frac", expr("((__n - 1) * pct % 100) / 100.0"))
      .select(col("pct"), col("__frac"), explode(array(
        struct(lit("lo").as("side"),
          expr("(100 + (__n - 1) * pct) div 100").as("__rank")),
        struct(lit("hi").as("side"),
          expr("(100 + (__n - 1) * pct + 99) div 100").as("__rank")))).as("p"))
      .select(col("pct"), col("__frac"), col("p.side").as("__side"),
        col("p.__rank").as("__rank"))
    val probeBins = probes.join(broadcast(hist),
        col("__rank") > col("__below") && col("__rank") <= col("__cum"))
      .select(col("pct"), col("__frac"), col("__side"), col("__rank"),
        col("__bin"), col("__below"))
    binned.join(broadcast(probeBins), "__bin")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("pct"), col("__side")).orderBy(col("__v"))))
      .filter(col("__below") + col("__rn") === col("__rank"))
      .groupBy("pct", "__frac")
      .agg(max(when(col("__side") === "lo", col("__v"))).as("__qlo"),
        max(when(col("__side") === "hi", col("__v"))).as("__qhi"))
      .select(col("pct"),
        (col("__qlo").cast("double") +
          (col("__qhi").cast("double") - col("__qlo").cast("double"))
            * col("__frac")).as("q_cont"))
  }

  /** Per-group exact quantiles WITHOUT per-group sorts — the grouped form of
    * [[histogramQuantiles]], for "q1/q3 per category" analytics where a
    * `Window.partitionBy(group)` sort would funnel each category through a
    * single reducer (catastrophic when one category holds most of the
    * corpus).
    *
    * Same three passes, all keyed by the group: pass 0 fixes a per-group
    * equi-width binning (one row per group, broadcast — the group column is
    * assumed low-cardinality, a category/source/type axis); pass 1
    * histograms `(group, bin)` with a map-side combine (shuffle ≤
    * groups·bins rows) and locates each percentile's bin with a cumulative
    * sum whose window is bounded by `bins`, never by group size; pass 2
    * ranks only the boundary-bin rows per (group, pct). Output: one row per
    * (group, pct) with the exact order statistic `qvalue` at rank
    * `ceil(n·p/100)` within the group.
    */
  def groupedHistogramQuantiles(df: DataFrame, group: String, value: Column,
      pcts: Seq[Int], bins: Int = 4096): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(group).as("__g"), value.cast("long").as("__v"))
    val bounds = v.groupBy("__g").agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"), count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withW = bounds.select(col("__g"), col("__lo"), col("__n"),
      expr(s"(__hi - __lo + $bins) div $bins").as("__w"))
    val binned = v.join(broadcast(withW), "__g")
      .select(col("__g"), col("__v"), expr("(__v - __lo) div __w").as("__bin"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)  // see histogramQuantiles
    val hist = binned.groupBy("__g", "__bin").agg(count(lit(1)).as("__bc"))
      .withColumn("__cum", sum(col("__bc")).over(
        Window.partitionBy(col("__g")).orderBy(col("__bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__below", col("__cum") - col("__bc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = pcts.toDF("pct")
      .crossJoin(broadcast(bounds.select(col("__g"), col("__n"))))
      .withColumn("__rank", expr("(__n * pct + 99) div 100"))
      .drop("__n")
    val probeBins = probes.join(broadcast(hist.withColumnRenamed("__g", "__gh")),
        col("__g") === col("__gh") &&
          col("__rank") > col("__below") && col("__rank") <= col("__cum"))
      .select(col("__g"), col("pct"), col("__rank"), col("__bin"), col("__below"))
    binned.join(broadcast(probeBins), Seq("__g", "__bin"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__g"), col("pct")).orderBy(col("__v"))))
      .filter(col("__below") + col("__rn") === col("__rank"))
      .select(col("__g").as(group), col("pct"),
        col("__rank").as("qrank"), col("__v").as("qvalue"))
  }

  /** Weighted exact quantile per group — the weighted companion to
    * [[groupedHistogramQuantiles]]: the quantile of a distribution in which
    * each row counts `weight` times (weighted median price where the weight
    * is units sold; latency percentile where the weight is request count).
    * Expanding each row `weight` times or sorting each group whole are both
    * scale-killers; the same three bounded passes work because weight is
    * additive per bin.
    *
    * The per-group rank target is `T = ceil(W·p/100)` over total weight `W`
    * (integer-only: `(W·p + 99) div 100`); the result is the smallest value
    * whose cumulative weight reaches `T`. Cumulation runs over PER-VALUE
    * aggregated weights, so tie order can never matter. Pass 2 differs from
    * the unweighted op: `row_number` cannot express weighted rank, so the
    * boundary bin's rows combine map-side to per-value weights and only ONE
    * bin's distinct values per group feed the cumulative window — bounded
    * by the bin's value spread, never by group size.
    *
    * `value` and `weight` must be integral (long-valued); rows with
    * non-positive weight are ignored (they hold no probability mass).
    * All requested percentiles resolve in ONE three-pass run (the corpus
    * is never rescanned per pct). Output: one row per (group, pct),
    * `qvalue` = the weighted p-quantile.
    */
  def groupedWeightedQuantiles(df: DataFrame, group: String, value: Column,
      weight: Column, pcts: Seq[Int], bins: Int = 4096): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val spark = df.sparkSession
    import spark.implicits._
    val w = df.select(col(group).as("__g"), value.cast("long").as("__v"),
        weight.cast("long").as("__wt"))
      .filter(col("__wt") > 0)
    // pass 0: per-group bounds + total weight — one row per group. The
    // tiny frames persist: each is consumed by ≥2 downstream broadcast
    // materializations, and without the pin every one re-runs the corpus
    // scan behind it (measured: 5 scans → 3 at sf0.1).
    val bounds = w.groupBy("__g").agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"), sum(col("__wt")).as("__tw"))
    val withW = bounds.select(col("__g"), col("__lo"), col("__tw"),
        expr(s"(__hi - __lo + $bins) div $bins").as("__w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val binned = w.join(broadcast(withW.select("__g", "__lo", "__w")), "__g")
      .select(col("__g"), col("__v"), col("__wt"),
        expr("(__v - __lo) div __w").as("__bin"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)  // see histogramQuantiles
    // pass 1: weight histogram, shuffle ≤ groups·bins after map-side combine
    val hist = binned.groupBy("__g", "__bin").agg(sum(col("__wt")).as("__bw"))
      .withColumn("__cum", sum(col("__bw")).over(
        Window.partitionBy(col("__g")).orderBy(col("__bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__below", col("__cum") - col("__bw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = pcts.toDF("pct")
      .crossJoin(broadcast(withW.select(col("__g"), col("__tw"))))
      .withColumn("__rank", expr("(__tw * pct + 99) div 100"))
      .drop("__tw")
    val probeBins = probes.join(broadcast(hist.withColumnRenamed("__g", "__gh")),
        col("__g") === col("__gh") &&
          col("__rank") > col("__below") && col("__rank") <= col("__cum"))
      .select(col("__g"), col("pct"), col("__bin"), col("__below"),
        col("__rank"))
    // pass 2: cumulate per-value weights inside the one boundary bin per
    // (group, pct) — a single probe join; the window is bounded by the
    // bin's value spread, never by group size
    binned.join(broadcast(probeBins), Seq("__g", "__bin"))
      .groupBy("__g", "pct", "__v", "__below", "__rank")
      .agg(sum(col("__wt")).as("__vw"))
      .withColumn("__cumv", sum(col("__vw")).over(
        Window.partitionBy(col("__g"), col("pct")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__below") + col("__cumv") >= col("__rank"))
      .groupBy(col("__g"), col("pct"))
      .agg(min(col("__v")).as("qvalue"))
      .select(col("__g").as(group), col("pct"), col("qvalue"))
  }

  /** Single-percentile convenience over [[groupedWeightedQuantiles]]:
    * output one row per group, (group, qvalue). */
  def groupedWeightedQuantile(df: DataFrame, group: String, value: Column,
      weight: Column, pct: Int, bins: Int = 4096): DataFrame =
    groupedWeightedQuantiles(df, group, value, weight, Seq(pct), bins)
      .drop("pct")

  /** Budget-crossing threshold per group — the data-mixing primitive:
    * walk each group's values in ascending order accumulating `weight`
    * (typically tokens, best rows first via the value order), and return
    * the value at which the running total first reaches `budget` — or the
    * group's last value when the whole group fits. Selecting
    * `value <= threshold` afterwards keeps a best-first prefix holding
    * the budget plus at most one crossing row; with a tie-broken
    * composite value the selection is exact and deterministic. Same three
    * bounded passes as [[groupedWeightedQuantiles]], with the per-group
    * rank target `least(budget, W)` instead of `ceil(W·p/100)`. Groups
    * with no positive-weight row produce no threshold. */
  def groupedWeightedBudgetThreshold(df: DataFrame, group: String,
      value: Column, weight: Column, budget: Long,
      bins: Int = 4096): DataFrame = {
    require(budget >= 1)
    val w = df.select(col(group).as("__g"), value.cast("long").as("__v"),
        weight.cast("long").as("__wt"))
      .filter(col("__wt") > 0)
    val bounds = w.groupBy("__g").agg(min(col("__v")).as("__lo"),
      max(col("__v")).as("__hi"), sum(col("__wt")).as("__tw"))
    val withW = bounds.select(col("__g"), col("__lo"),
        expr(s"(__hi - __lo + $bins) div $bins").as("__w"),
        expr(s"least($budget, __tw)").as("__rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val binned = w.join(broadcast(withW.select("__g", "__lo", "__w")), "__g")
      .select(col("__g"), col("__v"), col("__wt"),
        expr("(__v - __lo) div __w").as("__bin"))
    val hist = binned.groupBy("__g", "__bin").agg(sum(col("__wt")).as("__bw"))
      .withColumn("__cum", sum(col("__bw")).over(
        Window.partitionBy(col("__g")).orderBy(col("__bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__below", col("__cum") - col("__bw"))
    val probeBins = hist.join(
        broadcast(withW.select(col("__g").as("__gp"), col("__rank"))),
        col("__g") === col("__gp") &&
          col("__rank") > col("__below") && col("__rank") <= col("__cum"))
      .select(col("__g"), col("__bin"), col("__below"), col("__rank"))
    binned.join(broadcast(probeBins), Seq("__g", "__bin"))
      .groupBy("__g", "__v", "__below", "__rank")
      .agg(sum(col("__wt")).as("__vw"))
      .withColumn("__cumv", sum(col("__vw")).over(
        Window.partitionBy(col("__g")).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__below") + col("__cumv") >= col("__rank"))
      .groupBy(col("__g"))
      .agg(min(col("__v")).as("qvalue"))
      .select(col("__g").as(group), col("qvalue"))
  }

  /** KMV (k-minimum-values) grouped distinct-count estimate over the
    * native [[graft.plans.KmvBottomK]] aggregate. Returns one row per
    * group with the bottom-k hash sketch reduced to an estimate:
    * fewer than k distinct hashes → the sketch is exhaustive and the
    * estimate is exact (= sketch size); otherwise (k−1)·2^60 / h_k with
    * h_k the k-th smallest hash. The division runs in double on exact
    * bigint inputs — one IEEE op, bit-identical in any engine — and
    * floors back to bigint. Shuffle = one ≤k array per group per
    * partition (see the aggregate's scaladoc for the 100 TB argument).
    */
  def kmvDistinctGrouped(df: DataFrame, group: String, key: Column,
      k: Int): DataFrame = {
    // NULL keys carry no distinct value: drop their rows BEFORE grouping
    // so a group whose keys are all NULL is omitted entirely (matching a
    // SQL `WHERE key IS NOT NULL` pre-filter / the q203 streaming path)
    // instead of surfacing as an empty sketch with kmv_est = 0
    val sk = df.filter(key.isNotNull).groupBy(group).agg(
      graft.plans.KmvBottomK(key, k).as("__kmv"))
    val hk = element_at(col("__kmv"), k).cast("double")
    val est = when(size(col("__kmv")) < k, size(col("__kmv")).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(1.152921504606846976e18) / hk)
        .cast("long"))
    sk.select(col(group), est.as("kmv_est"),
      size(col("__kmv")).cast("long").as("kmv_size"))
  }
}
