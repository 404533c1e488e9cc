package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the training-data
  * pipeline extensions) is registered as a [[QueryDef]] in one of the
  * per-area modules under `graft.queries`; this object is just the
  * aggregation point the driver reads.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def all: Seq[QueryDef] =
    graft.queries.CoreQueries.defs ++
      graft.queries.SourceQueries.defs ++
      graft.queries.ArrayQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.MetricaQueries.defs ++
      graft.queries.StreamingQueries.defs ++
      graft.queries.DialectQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries.apply("q07_star_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Headline queries timed by [[Bench]]. */
  def benchNames: Seq[String] = all.filter(_.bench).map(_.name)
}
