package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers one [[GQuery]] in a module's
  * `queries`; the driver runs each through Verify (DuckDB oracle compare at
  * sf0.01) and Bench (sf0.1 timings).
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    graft.operators.Cleaning,
    graft.operators.Relational,
    graft.operators.Analytics,
    graft.operators.Temporal,
    graft.operators.Dedup,
    graft.operators.Similarity,
    graft.operators.TextOps,
    graft.operators.Search,
    graft.operators.Events,
    graft.operators.ScaleOps,
    graft.sources.RoundTrip,
    graft.sources.JdbcUpsert,
    graft.streaming.StreamOps,
    graft.functions.Multimodal,
  )

  lazy val registry: Seq[GQuery] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Cleaning.pipelineAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
