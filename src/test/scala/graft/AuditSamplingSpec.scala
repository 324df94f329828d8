package graft

import org.apache.spark.sql.functions._

import graft.queries.AuditSampling

/** Contract of the routine-rung audit sampling (q230–q233): exact path
  * bit-identical at mod = 1, deterministic hash thinning at mod > 1, and
  * thinning that commutes with distinct (the property that lets a sampled
  * count estimate the distinct candidate mass). */
class AuditSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(n: Int) =
    (0 until n).flatMap(a => (a + 1 until a + 4).map(b => (a.toLong, b.toLong)))
      .toDF("a_id", "b_id")

  test("mod: default 1; conf wins over env; invalid values fall back") {
    val key = "spark.graft.audit.sampleMod"
    spark.conf.unset(key)
    try {
      assert(AuditSampling.mod(spark) === 1)
      spark.conf.set(key, "100")
      assert(AuditSampling.mod(spark) === 100)
      spark.conf.set(key, "0") // < 1 is not a sampling rate
      assert(AuditSampling.mod(spark) === 1)
      // non-numeric garbage must fall back, never crash the audit build
      Seq("1e2", "100x", "", "  ").foreach { bad =>
        spark.conf.set(key, bad)
        assert(AuditSampling.mod(spark) === 1, s"input '$bad'")
      }
    } finally spark.conf.unset(key) // shared session: never leak the knob
  }

  test("sample: identity at mod 1, deterministic 1/m subset at mod > 1") {
    val df = pairs(2000)
    assert(AuditSampling.sample(df, "a_id", "b_id", 1).count() === df.count())
    val s1 = AuditSampling.sample(df, "a_id", "b_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = AuditSampling.sample(df, "a_id", "b_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1 === s2, "sampling must be deterministic")
    val n = df.count().toDouble
    assert(s1.size > n / 10 * 0.5 && s1.size < n / 10 * 2.0,
      s"expected ~${n / 10} sampled pairs, got ${s1.size}")
  }

  test("sample commutes with distinct (consistent per-pair decision)") {
    val dup = pairs(500).union(pairs(500)) // every pair twice
    val a = AuditSampling.sample(dup.distinct(), "a_id", "b_id", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = AuditSampling.sample(dup, "a_id", "b_id", 7).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("scaled/bound: exact forms at mod 1, scaled + slack when sampled") {
    val one = Seq((100L, 45L, 10L)).toDF("cand", "pairs", "n")
    def eval(c: org.apache.spark.sql.Column): Any =
      one.select(c.as("v")).collect()(0).get(0)
    // mod 1: cand <= 2*pairs + 2*n  →  100 <= 90 + 20 = true
    assert(eval(AuditSampling.bound(col("cand"), col("pairs"), 2,
      lit(2) * col("n"), 1)) === true)
    // and the strict form fails when pairs drop (100 <= 2*35+20 = false)
    val low = Seq((100L, 35L, 10L)).toDF("cand", "pairs", "n")
    assert(low.select(AuditSampling.bound(col("cand"), col("pairs"), 2,
      lit(2) * col("n"), 1).as("v")).collect()(0).getBoolean(0) === false)
    // sampled: counts scale by m and the 1.1x slack applies —
    // cand_est 10*10=100 vs 1.1*(2*45*? ...) with m=10, pairs sampled 4:
    // 100 <= 1.1*(2*40 + 20) = 110 → true (would fail without slack)
    val s = Seq((10L, 4L, 10L)).toDF("cand", "pairs", "n")
    assert(s.select(AuditSampling.bound(col("cand"), col("pairs"), 2,
      lit(2) * col("n"), 10).as("v")).collect()(0).getBoolean(0) === true)
    assert(eval(AuditSampling.scaled(col("cand"), 1)) === 100L)
    assert(eval(AuditSampling.scaled(col("cand"), 10)) === 1000L)
  }

  test("sampleIds: identity at mod 1; deterministic ~1/m id subset") {
    val ids = (0L until 3000L).toDF("a_id")
    assert(AuditSampling.sampleIds(ids, "a_id", 1).count() === 3000L)
    val s1 = AuditSampling.sampleIds(ids, "a_id", 10)
      .collect().map(_.getLong(0)).toSet
    val s2 = AuditSampling.sampleIds(ids, "a_id", 10)
      .collect().map(_.getLong(0)).toSet
    assert(s1 === s2, "id sampling must be deterministic")
    assert(s1.size > 150 && s1.size < 600, s"expected ~300, got ${s1.size}")
    // survivors keep EXACT per-query semantics: the sample is a subset of
    // the id space, never a rewrite of it
    assert(s1.subsetOf((0L until 3000L).toSet))
  }

  test("audit output self-marks its sampling modulus (sample_mod column)") {
    // a leaked SPARK_GRAFT_AUDIT_SAMPLE_MOD must never let a sampled run
    // pass as an exact certification: the effective mod rides the row
    val key = "spark.graft.audit.sampleMod"
    spark.conf.unset(key)
    try {
      val exact = SparkEntry.queries("q230_minhash_cand_audit")(spark, sf0001)
        .collect()(0)
      assert(exact.getAs[Int]("sample_mod") === 1)
      spark.conf.set(key, "3")
      val sampled = SparkEntry
        .queries("q230_minhash_cand_audit")(spark, sf0001).collect()(0)
      assert(sampled.getAs[Int]("sample_mod") === 3)
    } finally {
      spark.conf.unset(key)
      spark.catalog.clearCache()
    }
  }
}
