package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, LlmQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The real point-in-time join, not a fig leaf. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("pit_events_ttl1h")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-data-pipeline extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ LlmQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ LlmQueries.oracleSql
}
