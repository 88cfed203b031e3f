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

  /** SQL entry point: register the fixture tables and the engine's
    * queries as temp views, so a spark-sql user can reach every operator
    * without touching the Scala API:
    *
    *   SparkEntry.installViews(spark, sfDir)
    *   spark.sql("SELECT * FROM q_agg_groupby")      // an engine query
    *   spark.sql("SELECT count(*) FROM lineitem")    // a base table
    *
    * Most views are LAZY plans (registration costs nothing; work happens
    * when the view is queried), but the registry entries that are
    * intrinsically eager — ALS-backed metrics, streaming replays,
    * GlobalRank two-pass shapes — do their work once at install time and
    * the view serves the result. The default installs the oracle-backed
    * queries; pass an explicit `names` set to install any subset,
    * including the no-oracle ones. Returns the installed view names. */
  def installViews(spark: SparkSession, sfDir: String,
      names: Option[Set[String]] = None): Seq[String] = {
    Tables.all.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    val selected = registry.filter(q =>
      names.map(_.contains(q.name)).getOrElse(q.oracle.isDefined))
    selected.foreach(q =>
      q.run(spark, sfDir).createOrReplaceTempView(q.name))
    Tables.all ++ selected.map(_.name)
  }
}
