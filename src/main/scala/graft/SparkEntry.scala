package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; each module contributes its `queries` + `oracles` maps.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Tables.tune(spark)
    AnalyticsOps.q1PricingSummary(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AnalyticsOps.queries ++ ScanOps.queries ++ VersionOps.queries ++ StatusOps.queries ++
      JoinOps.queries ++ graft.functions.TextFunctions.queries ++
      QualityModelOps.queries ++ TimeSeriesOps.queries ++
      DedupOps.queries ++ AnnOps.queries ++ SemDedupOps.queries ++
      MultimodalOps.queries ++ SubmitOps.queries ++
      OrgOps.queries ++ ExtractOps.queries ++ MappingExtractOps.queries ++
      PipelineOps.queries ++ TransferOps.queries ++ SkewOps.queries ++
      SearchOps.queries ++ ClassifierOps.queries ++ GraphOps.queries ++
      HtmlOps.queries ++ EncodingOps.queries ++ BpeOps.queries

  /** DuckDB-equivalent SQL for each hash-checked query (column names must
    * match the Spark output exactly; see SURVEY.md §6 for FP discipline). */
  def oracleSql: Map[String, String] =
    AnalyticsOps.oracles ++ ScanOps.oracles ++ VersionOps.oracles ++ StatusOps.oracles ++
      JoinOps.oracles ++ graft.functions.TextFunctions.oracles ++
      QualityModelOps.oracles ++ TimeSeriesOps.oracles ++
      DedupOps.oracles ++ AnnOps.oracles ++ SemDedupOps.oracles ++
      MultimodalOps.oracles ++ SubmitOps.oracles ++
      OrgOps.oracles ++ ExtractOps.oracles ++ MappingExtractOps.oracles ++
      PipelineOps.oracles ++ TransferOps.oracles ++ SkewOps.oracles ++
      SearchOps.oracles ++ ClassifierOps.oracles ++ GraphOps.oracles ++
      HtmlOps.oracles ++ EncodingOps.oracles ++ BpeOps.oracles
}
