package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-area modules; each query name maps to an
  * operator in SURVEY.md §2 (or the training-data extension surface) and each
  * SQL-expressible query carries a DuckDB oracle with identical column names
  * and a deterministic ORDER BY.
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.RelationalOps.queries, operators.RelationalOps.oracles),
      (operators.TextOps.queries, operators.TextOps.oracles),
      (operators.Dedup.queries, operators.Dedup.oracles),
      (operators.Similarity.queries, operators.Similarity.oracles),
      (operators.Clustering.queries, operators.Clustering.oracles),
      (operators.Multimodal.queries, operators.Multimodal.oracles),
      (operators.StreamingOps.queries, operators.StreamingOps.oracles),
      (operators.AnalyticOps.queries, operators.AnalyticOps.oracles),
      (operators.CurationOps.queries, operators.CurationOps.oracles),
      (operators.GraphOps.queries, operators.GraphOps.oracles),
      (operators.Differential.queries, operators.Differential.oracles),
      (operators.GeoPipelineOps.queries, operators.GeoPipelineOps.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q2_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
