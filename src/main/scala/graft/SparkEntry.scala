package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query; `oracleSql`
  * carries the DuckDB-equivalent SQL for the driver's hash compare.
  * Column names and row ordering are kept identical on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Expressions.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.DataOps.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.PyramidQueries.queries ++
      graft.queries.RangeQueries.queries ++
      graft.queries.CorpusOps.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.LayoutQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.QualityQueries.queries ++
      graft.queries.IngestQueries.queries ++
      graft.queries.Behavior.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.Expressions.oracles ++
      graft.queries.StreamingQueries.oracles ++
      graft.queries.DataOps.oracles ++
      graft.queries.Pipeline.oracles ++
      graft.queries.PyramidQueries.oracles ++
      graft.queries.RangeQueries.oracles ++
      graft.queries.CorpusOps.oracles ++
      graft.queries.SketchQueries.oracles ++
      graft.queries.LayoutQueries.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.QualityQueries.oracles ++
      graft.queries.IngestQueries.oracles ++
      graft.queries.Behavior.oracles
}
