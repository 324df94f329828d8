package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver test tables, with a DuckDB oracle where the semantics are
  * ANSI-SQL-expressible. The registry is assembled from per-domain modules
  * under [[graft.queries]].
  */
object SparkEntry {

  /** All registered query definitions, in registration order. */
  def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ CleanerQueries.defs ++
      DedupQueries.defs ++ EmbeddingQueries.defs ++ TextQueries.defs ++
      StreamingQueries.defs ++ MetricQueries.defs ++ ClusterQueries.defs ++
      MiscQueries.defs ++ ExtendedQueries.defs ++ PipelineQueries.defs ++
      WarehouseQueries.defs ++ ScaleQueries.defs ++ RankQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_star_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
