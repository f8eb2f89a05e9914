package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator surface (SURVEY.md §2, normative) is implemented as one
  * OpRegistry object per category; this object flattens them into the
  * `queries` / `oracleSql` maps the driver harness consumes.
  */
object SparkEntry {

  private def registries: Seq[OpRegistry] = Seq(
    operators.Scans,
    operators.Filters,
    operators.Joins,
    operators.Aggregations,
    operators.Windows,
    functions.Scalars,
    operators.SortsLimits,
    operators.SetOps,
    operators.Subqueries,
    operators.TypedOps,
    operators.Analytics,
    operators.Timeseries,
    operators.Profiling,
    llm.TextOps,
    llm.VectorOps,
    llm.DedupOps,
    llm.PipelineOps,
    streaming.Streaming,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * agg_pricing_summary = TPC-H Q1 shape (SURVEY §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.oracleSql).toMap
}
