package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-facing query: a Spark implementation over the test tables in
  * `sfDir` plus (when SQL-expressible) a DuckDB oracle on the same tables.
  * Column names MUST match between the two — the driver sorts columns by
  * name and hash-compares values (builder contract).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
