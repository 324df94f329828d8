package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import graft.plans.{FxExp2, FxExp2Expr, FxLog2, FxLog2Expr}

/** Column + oracle-SQL faces of the [[graft.plans.FxLog2]] fixed-point
  * log2 contract. The Spark side is one native codegen'd expression; the
  * DuckDB side is a generated CTE chain over the SAME shifts, masks, and
  * embedded lookup table — integer-only, so the two replay bit-for-bit.
  */
object FxLog {

  /** `log2fx(n)`: fixed-point log2 (units of 2^-16) of a positive bigint
    * column; null or non-positive → null. */
  def log2fx(n: Column): Column =
    GraftBridge.column(FxLog2Expr(GraftBridge.expression(n)))

  private val eCase: String = (62 to 1 by -1)
    .map(k => s"WHEN __n >= ${1L << k} THEN $k")
    .mkString("(CASE ", " ", " ELSE 0 END)")

  private val lutLit: String = FxLog2.LUT.mkString("[", ",", "]")
  private val dlutLit: String =
    (0 until 256).map(i => FxLog2.LUT(i + 1) - FxLog2.LUT(i))
      .mkString("[", ",", "]")

  /** `exp2fx(x)`: fixed-point 2^x (x and result in units of 2^-16) of a
    * column in [0, 46·2^16); null or out-of-domain → null. */
  def exp2fx(x: Column): Column =
    GraftBridge.column(FxExp2Expr(GraftBridge.expression(x)))

  private val elutLit: String = FxExp2.LUT.mkString("[", ",", "]")
  private val edlutLit: String =
    (0 until 256).map(i => FxExp2.LUT(i + 1) - FxExp2.LUT(i))
      .mkString("[", ",", "]")

  /** DuckDB CTE chain computing `resCol = exp2fx(xExpr)` over every row
    * of CTE `prev` (same splice convention as [[sqlCtes]]; helper CTEs
    * `p_x`/`p_g` plus the final CTE named `p`). Out-of-domain inputs
    * (NULL, negative, or ≥ 46·2^16) yield NULL — the same semantics as
    * [[graft.plans.FxExp2Expr]], so a call site that misses an upstream
    * guard diverges loudly (NULL) on both engines instead of silently on
    * one. The clamp in `p_g` only keeps the shift arithmetic in-range for
    * rows the CASE nulls anyway. */
  def sqlExpCtes(p: String, prev: String, xExpr: String, resCol: String): String =
    s"""${p}_x AS (SELECT *, cast(($xExpr) as bigint) AS __x0 FROM $prev),
       |${p}_g AS (SELECT *,
       |  least(greatest(__x0, 0), ${FxExp2.MAX_X - 1}) AS __x FROM ${p}_x),
       |$p AS (SELECT * EXCLUDE (__x0, __x),
       |  CASE WHEN __x0 >= 0 AND __x0 < ${FxExp2.MAX_X} THEN
       |    ($elutLit[((__x & 65535) >> 8) + 1]
       |      + (($edlutLit[((__x & 65535) >> 8) + 1] * (__x & 255)) >> 8))
       |      << (__x >> 16)
       |  END AS $resCol
       |  FROM ${p}_g)""".stripMargin

  /** DuckDB CTE chain computing `resCol = log2fx(nExpr)` over every row of
    * CTE `prev`, appending four helper CTEs (`p_n`, `p_g`, `p_e`, `p_m`)
    * and a final CTE named `p` that carries all of `prev`'s columns plus
    * `resCol`. Splice the result into a WITH list:
    * {{{ s"WITH src AS (...), ${FxLog.sqlCtes("lg", "src", "cnt", "lg_cnt")} SELECT ... FROM lg" }}}
    * Out-of-domain inputs (NULL or n ≤ 0) yield NULL — identical to
    * [[graft.plans.FxLog2Expr]], so the generated SQL and the native
    * kernel agree on the FULL input range, not just guarded call sites.
    * The `greatest` clamp in `p_g` keeps the shift/index arithmetic
    * in-range for rows the final CASE nulls anyway. */
  def sqlCtes(p: String, prev: String, nExpr: String, resCol: String): String =
    s"""${p}_n AS (SELECT *, cast(($nExpr) as bigint) AS __n0 FROM $prev),
       |${p}_g AS (SELECT *, greatest(__n0, 1) AS __n FROM ${p}_n),
       |${p}_e AS (SELECT *, $eCase AS __e FROM ${p}_g),
       |${p}_m AS (SELECT *, (CASE WHEN __e >= 30 THEN __n >> (__e - 30)
       |                          ELSE __n << (30 - __e) END) AS __m
       |           FROM ${p}_e),
       |$p AS (SELECT * EXCLUDE (__n0, __n, __e, __m),
       |  CASE WHEN __n0 > 0 THEN
       |    __e * 65536 + $lutLit[(__m >> 22) - 255]
       |      + (($dlutLit[(__m >> 22) - 255] * (__m & 4194303)) >> 22)
       |  END AS $resCol
       |  FROM ${p}_m)""".stripMargin
}
