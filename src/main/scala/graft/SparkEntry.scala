package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §0.3/§7.
  *
  * `queries` / `oracleSql` are assembled from per-area registries under
  * `graft.operators` / `graft.streaming`; every declared key is
  * locally pre-flighted against DuckDB (tools/preflight.py) before it
  * lands here (SURVEY §7.1 declare-as-you-implement).
  */
object SparkEntry {

  private val registries: Seq[(Map[String, (SparkSession, String) => DataFrame],
                               Map[String, String])] = Seq(
    (operators.RelationalCore.queries, operators.RelationalCore.oracles),
    (operators.Joins.queries, operators.Joins.oracles),
    (operators.FiltersDerive.queries, operators.FiltersDerive.oracles),
    (operators.Aggregates.queries, operators.Aggregates.oracles),
    (operators.SetDedup.queries, operators.SetDedup.oracles),
    (operators.Windows.queries, operators.Windows.oracles),
    (operators.Functions.queries, operators.Functions.oracles),
    (operators.TextOps.queries, operators.TextOps.oracles),
    (operators.Similarity.queries, operators.Similarity.oracles),
    (streaming.Streaming.queries, streaming.Streaming.oracles),
    (sources.Staging.queries, sources.Staging.oracles),
    (operators.DedupAdvanced.queries, operators.DedupAdvanced.oracles),
    (operators.TextPipeline.queries, operators.TextPipeline.oracles),
    (operators.ScaleJoins.queries, operators.ScaleJoins.oracles),
    (operators.Subqueries.queries, operators.Subqueries.oracles),
    (operators.Analytics2.queries, operators.Analytics2.oracles),
    (operators.Clustering.queries, operators.Clustering.oracles),
    (operators.Lifecycle.queries, operators.Lifecycle.oracles),
    (operators.CurationOps.queries, operators.CurationOps.oracles),
    (operators.Analytics3.queries, operators.Analytics3.oracles),
    (operators.Governance.queries, operators.Governance.oracles),
    (operators.TextModel.queries, operators.TextModel.oracles),
    (operators.GraphOps.queries, operators.GraphOps.oracles),
    (operators.Features.queries, operators.Features.oracles),
    (operators.Analytics4.queries, operators.Analytics4.oracles),
    (operators.Spatial.queries, operators.Spatial.oracles),
    (operators.Similarity2.queries, operators.Similarity2.oracles),
    (operators.Curation2.queries, operators.Curation2.oracles),
    (operators.Analytics5.queries, operators.Analytics5.oracles),
    (operators.Analytics6.queries, operators.Analytics6.oracles),
    (operators.Similarity3.queries, operators.Similarity3.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    registries.iterator.map(_._2).reduce(_ ++ _)
}
