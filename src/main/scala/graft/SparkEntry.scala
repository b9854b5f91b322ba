package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, CrawlQueries, ExtQueries, MiningQueries, OpsQueries, RelationalQueries, SnapshotQueries, StreamQueries, TakedownQueries, TrainPrepQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live under graft.queries.*; this object only
  * merges their maps. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ OpsQueries.queries ++ RelationalQueries.queries ++
      ExtQueries.queries ++ StreamQueries.queries ++ AnalyticsQueries.queries ++
      MiningQueries.queries ++ CrawlQueries.queries ++ SnapshotQueries.queries ++
      TrainPrepQueries.queries ++ TakedownQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ OpsQueries.oracle ++ RelationalQueries.oracle ++
      ExtQueries.oracle ++ StreamQueries.oracle ++ AnalyticsQueries.oracle ++
      MiningQueries.oracle ++ CrawlQueries.oracle ++ SnapshotQueries.oracle ++
      TrainPrepQueries.oracle ++ TakedownQueries.oracle
}
