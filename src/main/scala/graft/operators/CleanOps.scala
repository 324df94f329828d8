package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps

/** The reference's cleaning-stage operators (SURVEY.md §2.3,
  * /root/reference/orderly/clean/cleaner.py) re-expressed over an
  * array-typed reaction table: each component family (`reactants`, `agents`,
  * `reagents`, `solvents`, `catalysts`, `products`) is one
  * `array<string>` column, `yields` is `array<double>` positionally aligned
  * with `products` (SURVEY.md §1.1). The numbered-wide layout of the
  * reference is handled at sink/source boundaries by [[ArrayOps.toWide]] /
  * [[ArrayOps.fromWide]], which collapses ~200 LoC of pandas column
  * gymnastics (C4/C16/E23) into a handful of expressions.
  *
  * Everything here is a lazy narrow transform except where noted; filters
  * compose into a single scan pass under whole-stage codegen.
  */
object CleanOps {

  /** C2 — unresolved-molecule-name handling (clean/cleaner.py:549-657).
    * Three modes over the broadcast bad-name set:
    *  - `NullifyIfMapped` (default): rows with `is_mapped` get bad names
    *    removed from every component list; rows without are DELETED if any
    *    component matches.
    *  - `DeleteAll`: drop any row containing a bad name.
    *  - `NullAll`: remove bad names from lists in every row.
    */
  sealed trait BadNameMode
  case object NullifyIfMapped extends BadNameMode
  case object DeleteAll extends BadNameMode
  case object NullAll extends BadNameMode

  def handleBadNames(df: DataFrame, componentCols: Seq[String],
      badNames: Seq[String], mode: BadNameMode,
      isMapped: Column = col("is_mapped")): DataFrame = {
    val bad = typedLit(badNames)
    def anyBad: Column = componentCols
      .map(c => size(array_intersect(col(c), bad)) > 0)
      .reduce(_ || _)
    def strip(d: DataFrame): DataFrame =
      componentCols.foldLeft(d)((acc, c) =>
        acc.withColumn(c, array_except(col(c), bad)))
    mode match {
      case DeleteAll => df.filter(!anyBad)
      case NullAll => strip(df)
      case NullifyIfMapped =>
        // Single pass, no union: mapped rows stripped, unmapped rows kept
        // only when clean. (The reference splits the frame in two and
        // re-concats, cleaner.py:596-657 — one scan here.)
        val kept = df.filter(isMapped || !anyBad)
        componentCols.foldLeft(kept)((acc, c) =>
          acc.withColumn(c, when(isMapped, array_except(col(c), bad))
            .otherwise(col(c))))
    }
  }

  /** C3 — catalyst→reagent overflow rename (clean/cleaner.py:148-167,
    * 659-681): catalysts beyond `numCat` move to the reagents list. */
  def renameCatalystOverflow(df: DataFrame, numCat: Int,
      catalysts: String = "catalysts", reagents: String = "reagents"): DataFrame =
    df.withColumn(reagents,
        concat(col(reagents), slice(col(catalysts), lit(numCat + 1),
          greatest(lit(0), size(col(catalysts)) - numCat))))
      .withColumn(catalysts, slice(col(catalysts), 1, numCat))

  /** C4 — component-count filter (clean/cleaner.py:169-225, 683-703): keep
    * rows with at most `k` components of the family; `k = -1` keeps all.
    * (The reference's column-masking/width-trim is a wide-layout artifact —
    * on arrays the row filter is the whole semantic.) */
  def trimComponents(df: DataFrame, c: String, k: Int): DataFrame =
    if (k < 0) df else df.filter(size(col(c)) <= k)

  /** C5 — non-empty filter per family (clean/cleaner.py:244-269, 705-724). */
  def requireNonEmpty(df: DataFrame, c: String): DataFrame =
    df.filter(size(col(c)) > 0)

  /** C6 — no-conditions filter: at least one condition component across all
    * families (clean/cleaner.py:227-242, 736-745 — conjunction across
    * types, unlike C5). */
  def requireAnyCondition(df: DataFrame, conditionCols: Seq[String]): DataFrame =
    df.filter(conditionCols.map(c => size(col(c))).reduce(_ + _) > 0)

  /** C7 — no-op-reaction filter: drop rows whose reactant set equals the
    * product set (clean/cleaner.py:271-287). */
  def dropNoopReactions(df: DataFrame,
      reactants: String = "reactants", products: String = "products"): DataFrame =
    df.filter(array_sort(array_distinct(col(reactants)))
      =!= array_sort(array_distinct(col(products))))

  /** C8 — yield-consistency filter (clean/cleaner.py:289-316, 756-765):
    * every yield in [0,100] or null, and the row-wise sum (nulls as 0)
    * ≤ 100. */
  def yieldConsistent(yields: Column): Column =
    forall(yields, y => y.isNull || (y >= 0 && y <= 100)) &&
      aggregate(yields, lit(0.0), (acc, y) => acc + coalesce(y, lit(0.0))) <= 100

  def filterYieldConsistent(df: DataFrame, c: String = "yields"): DataFrame =
    df.filter(yieldConsistent(col(c)))

  /** C9 over array columns — value counts across all component families:
    * one flatten+explode into a single hash aggregate (map-side partial,
    * one shuffle) — clean/cleaner.py:318-339. */
  def valueCountsArrays(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(explode(flatten(array(cols.map(col): _*))).as("value"))
      .filter(col("value").isNotNull)
      .groupBy("value").agg(count(lit(1)).as("cnt"))

  /** C10 over array columns — rare values → "other" inside each list
    * (clean/cleaner.py:341-368).
    *
    * Scale note: under a zipf dictionary the RARE set is the unbounded long
    * tail — never collect or broadcast it. The FREQUENT set (count ≥
    * minFreq) is bounded by |data|/minFreq, so we collect that and test
    * membership against it; anything present-but-not-frequent is rare. For
    * dictionaries where even the frequent set is too large, explode and use
    * the join-based [[Relational.mapRareToOther]].
    */
  def mapRareToOtherArrays(df: DataFrame, cols: Seq[String], minFreq: Long,
      other: String = "other", maxLiteralSet: Int = defaultMaxLiteralSet,
      rowKey: String = "original_index"): DataFrame =
    frequentSet(df, cols, minFreq, maxLiteralSet) match {
      case Some(fs) =>
        cols.foldLeft(df)((acc, c) => acc.withColumn(c,
          transform(col(c), x =>
            when(x.isNotNull && !array_contains(fs, x), lit(other)).otherwise(x))))
      case None =>
        Relational.mapRareToOtherArraysJoin(df, cols, minFreq, rowKey, other)
    }

  /** C11 over array columns — drop rows containing any rare value
    * (clean/cleaner.py:370-396). Same frequent-set reasoning as C10.
    * Null-array semantics (both paths agree, spec-locked): a null list
    * contains no values, so it never makes its row rare — the row is
    * dropped only if some OTHER column holds a rare value. */
  def removeRareRowsArrays(df: DataFrame, cols: Seq[String], minFreq: Long,
      maxLiteralSet: Int = defaultMaxLiteralSet,
      rowKey: String = "original_index"): DataFrame =
    frequentSet(df, cols, minFreq, maxLiteralSet) match {
      case Some(fs) =>
        // coalesce: exists(null_array) is SQL-null, which would flip the
        // whole predicate to null and silently DROP the row under !
        df.filter(!cols.map(c =>
          exists(coalesce(col(c), array().cast("array<string>")),
            x => x.isNotNull && !array_contains(fs, x))).reduce(_ || _))
      case None =>
        Relational.removeRareRowsArraysJoin(df, cols, minFreq, rowKey)
    }

  /** Frequent-set size guard: the set is bounded by |data|/minFreq, so at
    * small scale it ships as a literal (scan-local membership test, no extra
    * shuffle); past `maxLiteralSet` values, return None and let callers take
    * the fully-distributed join path instead of materializing a huge literal
    * on the driver. The probe `limit(max+1).count` never pulls values. */
  val defaultMaxLiteralSet = 100000

  private def frequentSet(df: DataFrame, cols: Seq[String], minFreq: Long,
      maxLiteralSet: Int): Option[Column] = {
    val freq = valueCountsArrays(df, cols).filter(col("cnt") >= minFreq)
      .select("value")
    // one action, not a count-probe + collect (which would run the full
    // value-counts aggregation twice): pulling max+1 strings is within the
    // same driver budget the guard enforces
    val rows = freq.limit(maxLiteralSet + 1).collect()
    if (rows.length > maxLiteralSet) None
    else Some(typedLit(rows.map(_.getString(0)).toSeq))
  }
}
