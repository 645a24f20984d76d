package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{SpaceType, Tables}
import graft.operators.ExactKnn
import graft.queries.{AnalyticsQueries, CorpusStatsQueries, DedupQueries, PipelineQueries, RelationalQueries, TextQueries, TpchQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; those
  * with ANSI-SQL-expressible semantics also have an `oracleSql` entry the
  * driver replays in DuckDB over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's headline
    * search-then-fetch read path (`POST .../documents/search`, SURVEY §3.1) —
    * batch KNN over the embeddings corpus + broadcast metadata join.
    */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.queries("knn_fetch_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TpchQueries.queries ++
      VectorQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ PipelineQueries.queries ++
      CorpusStatsQueries.queries ++ AnalyticsQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TpchQueries.oracles ++
      VectorQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ PipelineQueries.oracles ++
      CorpusStatsQueries.oracles ++ AnalyticsQueries.oracles

  /** Deterministic oracle-input tables (candidate/probe/assignment sets of
    * the approximate ANN tiers). Verify writes each to `<outDir>_aux/<name>`
    * and substitutes `{AUX}` in oracleSql with that directory, so DuckDB can
    * replay "exact KNN restricted to these candidates" as a full
    * rows+schema+hash gate on queries whose candidate generation is not
    * SQL-expressible.
    */
  def oracleInputs: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.oracleInputs ++ CorpusStatsQueries.oracleInputs
}
