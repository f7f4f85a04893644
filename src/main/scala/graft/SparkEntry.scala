package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{DedupQueries, GraphQueries, MultimodalQueries,
  RelationalQueries, SimilarityQueries, SketchQueries, StreamingQueries,
  TemporalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the query surface of every engine module; each entry has a
  * DuckDB oracle with identical column aliases and deterministic ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1ShippingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      StreamingQueries.queries ++ MultimodalQueries.queries ++
      TemporalQueries.queries ++ SketchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ GraphQueries.oracle ++
      TextQueries.oracle ++ DedupQueries.oracle ++ SimilarityQueries.oracle ++
      StreamingQueries.oracle ++ MultimodalQueries.oracle ++
      TemporalQueries.oracle ++ SketchQueries.oracle
}
