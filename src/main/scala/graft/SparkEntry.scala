package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextAnalysis
import graft.operators.{Aggregates, Coverage, Dedup, Merge, Multimodal,
  Relational, Similarity, Timeseries, Tpch}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator implementations live in graft.operators.* / graft.functions.*;
  * this object only aggregates their registries. */
object SparkEntry {

  /** Flagship query (Q1 analog: join + date filter + projection + total
    * sort) on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1JoinFilterSort(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Aggregates.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Streams.queries ++ Coverage.queries ++ Timeseries.queries ++
      Merge.queries ++ graft.sources.Lake.queries ++
      graft.sources.Jdbc.queries ++ graft.sources.Mongo.queries ++
      Tpch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (engine-specific sketches)
    * get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Aggregates.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      Streams.oracles ++ Coverage.oracles ++ Timeseries.oracles ++
      Merge.oracles ++ graft.sources.Lake.oracles ++
      graft.sources.Jdbc.oracles ++ graft.sources.Mongo.oracles ++
      Tpch.oracles
}
