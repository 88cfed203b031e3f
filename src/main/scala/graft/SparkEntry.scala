package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operators live in the `graft.operators` / `graft.ml` / `graft.llm` /
  * `graft.streaming` packages as composable library code; this object is
  * only the registry the verification driver consumes.
  */
object SparkEntry {

  /** Every declared operator (SURVEY.md §2), one registry per family. */
  def registry: Seq[Q] =
    operators.Relational.all ++
      operators.Aggregates.all ++
      operators.Windows.all ++
      operators.Scalars.all ++
      operators.StreamingQueries.all ++
      operators.MfQueries.all ++
      operators.LlmQueries.all ++
      operators.PipelineQueries.all ++
      operators.AnalyticsQueries.all ++
      operators.EvalQueries.all ++
      operators.StatQueries.all ++
      operators.CurationQueries.all ++
      operators.ExplainQueries.all ++
      operators.DiagQueries.all ++
      operators.GraphQueries.all ++
      operators.ProfileQueries.all ++
      operators.RankQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.qAggGroupby.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
