package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Routine-rung sampling for the candidate-mass audits (q230–q233) and
  * the exact-certifier agreement audits (q237/q238).
  *
  * The audits certify `candidates ≤ α·pairs + linear(n)` by counting the
  * EXACT candidate set and verifying every candidate pair — at the 100×
  * ladder rung that exactness is the audit's own cost (r10: q230 took
  * 842 s counting/verifying 106.56 M candidates, q233 1,250 s for
  * 37.85 M), too expensive to run every round. For routine rungs the
  * bound only needs ~1% precision, so with `spark.graft.audit.sampleMod =
  * m > 1` (or env `SPARK_GRAFT_AUDIT_SAMPLE_MOD`, read by the ladder
  * script) an audit keeps candidate pair (a, b) only when
  * `xxhash64(a, b) % m == 0` — a deterministic 1/m Bernoulli thinning
  * applied AFTER the production candidate stage (the stage under audit
  * runs untouched at full scale) and BEFORE the expensive per-pair
  * verification and distinct-count work. Reported counts are scaled back
  * by m and the bound check gets a 1.1× sampling-noise slack (the 100×
  * rungs sample ≥10⁵ pairs at m=100, so the relative count error is
  * ≲1% — the slack is generous, and a real quadratic blow-up overshoots
  * the bound by orders of magnitude, not 10%).
  *
  * With the default m = 1 every helper is the identity / the original
  * exact expression — the DuckDB oracle and the tri-SF certification
  * never see a sampled run (the driver sets neither the conf nor the
  * env). Certification rungs keep running the exact form.
  */
object AuditSampling {

  /** Sampling modulus: conf `spark.graft.audit.sampleMod`, then env
    * `SPARK_GRAFT_AUDIT_SAMPLE_MOD`, default 1 (exact). */
  def mod(s: SparkSession): Int =
    s.conf.getOption("spark.graft.audit.sampleMod")
      .orElse(sys.env.get("SPARK_GRAFT_AUDIT_SAMPLE_MOD"))
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(1)

  /** Keep ~1/m of candidate pairs, deterministically by pair hash —
    * consistent for a given (a, b) across stages, so thinning before a
    * distinct() samples the distinct set faithfully. Identity at m ≤ 1. */
  def sample(cand: DataFrame, aCol: String, bCol: String, m: Int): DataFrame =
    if (m <= 1) cand
    else cand.filter(pmod(xxhash64(col(aCol), col(bCol)), lit(m.toLong)) === 0)

  /** Query-side thinning for the exact-certifier agreement audits
    * (q237/q238): keep ~1/m of QUERY rows by id hash. Per-query top-k /
    * margin semantics need the FULL corpus side, so thinning the pair
    * space would change every surviving answer — thinning the query
    * space instead keeps each survivor's answer EXACT and only shrinks
    * the certified sample (agreement FRACTIONS need no scale-back).
    * Identity at m ≤ 1. */
  def sampleIds(df: DataFrame, idCol: String, m: Int): DataFrame =
    if (m <= 1) df
    else df.filter(pmod(xxhash64(col(idCol)), lit(m.toLong)) === 0)

  /** Scale a sampled count back to a corpus-level estimate (identity at
    * m ≤ 1, so the exact path emits the unscaled bigint the oracle
    * compares). */
  def scaled(cnt: Column, m: Int): Column =
    if (m <= 1) cnt else cnt * lit(m.toLong)

  /** `within_bound` expression: at m = 1 exactly the committed oracle
    * form `cand ≤ α·pairs + linear`; when sampled, both counts scale by m
    * and the right side gains the 10% noise slack (double compare — the
    * sampled path never meets the oracle). */
  def bound(candCnt: Column, pairCnt: Column, alpha: Int, linear: Column,
      m: Int): Column =
    if (m <= 1) candCnt <= lit(alpha) * pairCnt + linear
    else (candCnt * lit(m.toLong)).cast("double") <=
      lit(1.1) * (lit(alpha) * pairCnt * lit(m.toLong) + linear).cast("double")
}
