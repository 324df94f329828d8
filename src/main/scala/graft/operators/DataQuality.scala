package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks over a table — the constraint-report
  * primitive (deequ/dbt-test flavor) a pipeline runs before promoting a
  * snapshot. Each check compiles to one aggregate (or one anti-join for
  * referential integrity); the report is their union: (check, n_violations).
  *
  * Scale shape: predicate/not-null checks share a single scan when Spark
  * fuses them (they are plain conditional counts); uniqueness is one
  * map-side-combined groupBy on the key; referential integrity is a
  * left-anti hash join against the (broadcastable) dimension — nothing
  * collects, nothing sorts.
  */
object DataQuality {

  sealed trait Check { def name: String }
  /** Rows where `violates` is true fail the check. */
  final case class Predicate(name: String, violates: Column) extends Check
  final case class NotNull(name: String, colName: String) extends Check
  /** Rows whose key occurs more than once all count as violations. */
  final case class Unique(name: String, cols: Seq[String]) extends Check
  /** Rows whose `keyCol` has no match in `dim(dimKey)`. */
  final case class RefIntegrity(name: String, keyCol: String,
      dim: DataFrame, dimKey: String) extends Check

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    // every row-predicate check (Predicate/NotNull) compiles into ONE
    // aggregate over ONE scan — a conditional count per check, melted to
    // rows afterward; only keyed checks (Unique/RefIntegrity) need their
    // own shuffle/join
    val rowChecks = checks.collect {
      case Predicate(name, violates) => name -> violates
      case NotNull(name, c) => name -> col(c).isNull
    }
    val scanPart =
      if (rowChecks.isEmpty) Nil
      else {
        val counts = rowChecks.map { case (name, cond) =>
          count(when(cond, 1)).as(name)
        }
        Seq(df.agg(counts.head, counts.tail: _*)
          .select(explode(array(rowChecks.map { case (name, _) =>
            struct(lit(name).as("check"), col(name).as("n_violations"))
          }: _*)).as("__r"))
          .select(col("__r.check"), col("__r.n_violations")))
      }
    val keyedParts = checks.collect {
      case Unique(name, cols) =>
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_violations"))
          .select(lit(name).as("check"), col("n_violations"))
      case RefIntegrity(name, keyCol, dim, dimKey) =>
        df.join(dim.select(col(dimKey).as(keyCol)).distinct(),
            Seq(keyCol), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check"), col("n_violations"))
    }
    (scanPart ++ keyedParts).reduce(_ unionByName _)
  }

  /** ANALYZE-style column statistics — (min, max, null count, exact NDV)
    * per column, the numbers a catalog needs for file skipping, join
    * ordering, and broadcast decisions. ONE pass over the table: all
    * columns' min/max/null counts are plain aggregates sharing the scan,
    * and the exact NDVs compile to Spark's multi-distinct Expand (each row
    * fans out once per distinct-column, then one shuffle of (column, value)
    * groups — never a per-column rescan of the table). min/max are emitted
    * as strings so heterogeneous columns stack into one long report;
    * callers needing typed bounds profile per type. At 100 TB swap the
    * exact NDVs for [[Sketches.hllRegisters]] — same report shape, no
    * Expand. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("column_name"),
          col(s"__min_$c").as("min_v"), col(s"__max_$c").as("max_v"),
          col(s"__nulls_$c").as("n_nulls"), col(s"__ndv_$c").as("ndv"))
      }: _*)).as("__p"))
      .select(col("__p.column_name").as("column_name"),
        col("__p.min_v").as("min_v"), col("__p.max_v").as("max_v"),
        col("__p.n_nulls").as("n_nulls"), col("__p.ndv").as("ndv"))
  }
}
