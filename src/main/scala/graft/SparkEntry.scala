package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.adsbx.{AdsbxConfig, Fixtures, Pipeline}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator group:
  *   - CotQueries: the reference's full pipeline (SURVEY §2.3-2.6) on the
  *     quirk-matrix fixture, oracle-checked via a VALUES-based DuckDB query;
  *   - Relational: classical operator coverage over the driver corpus.
  */
object SparkEntry {

  /** Flagship: the reference's end-to-end dataflow (P1-P17 + D1 + J2) in
    * pass-through mode over the fixture — smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.features(
      Fixtures.aircraftDf(spark), Fixtures.includesDf(spark),
      AdsbxConfig(includesFiltering = false))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CotQueries.queries ++ Relational.queries ++ Relational2.queries ++
      Bucketing.queries ++ FormatOps.queries ++ DedupOps.queries ++
      TextOps.queries ++ BpeOps.queries ++ CleanOps.queries ++ SpanOps.queries ++
      Similarity.queries ++
      MultimodalOps.queries ++ SkewOps.queries ++ ProfileOps.queries ++
      KmvOps.queries ++
      SplitOps.queries ++ FuzzyMatch.queries ++ GeoOps.queries ++ HistoryOps.queries ++
      GraphOps.queries ++ ContractOps.queries ++ TimeSeriesOps.queries ++
      graft.streaming.StreamOps.queries

  def oracleSql: Map[String, String] =
    CotQueries.oracles ++ Relational.oracles ++ Relational2.oracles ++
      Bucketing.oracles ++ FormatOps.oracles ++ DedupOps.oracles ++
      TextOps.oracles ++ BpeOps.oracles ++ CleanOps.oracles ++ SpanOps.oracles ++
      Similarity.oracles ++
      MultimodalOps.oracles ++ SkewOps.oracles ++ ProfileOps.oracles ++
      KmvOps.oracles ++
      SplitOps.oracles ++ FuzzyMatch.oracles ++ GeoOps.oracles ++ HistoryOps.oracles ++
      GraphOps.oracles ++ ContractOps.oracles ++ TimeSeriesOps.oracles ++
      graft.streaming.StreamOps.oracles
}
